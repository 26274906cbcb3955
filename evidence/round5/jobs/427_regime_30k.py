# Regime-curve point at the 30k continuation checkpoint: production +
# serving_v3 (the licensed paths) + serving_v2 (for the demotion record)
# at the most accurate regime yet. Extends evidence/round5/regime_curve.json
# toward the reference's trained regime.
import sys, runpy, os.path as osp
for k in [k for k in list(sys.modules) if k.startswith("kd_pointcloud_tpu")]:
    del sys.modules[k]
sys.path.insert(0, "/root/repo")
ck = "/tmp/kdpc_train_parity/semitrained_teacher_30k.msgpack"
assert osp.exists(ck), "30k continuation checkpoint missing (job 426)"
sys.argv = ["regime_curve.py", "--ckpts", ck, "--scenes", "50",
            "--variants", "production,serving_v3,serving_v2",
            "--out", "/tmp/kdpc_train_parity/regime_curve_30k.json"]
runpy.run_path("/root/repo/scripts/regime_curve.py", run_name="__main__")
