# Regime-curve sweep of the K=24@l0 candidate relaxations (session-3):
# prod_k24l0 / k24l0_cw0 / prod_k24l01 over the same 6 checkpoints as job
# 409, paired per-scene SEs. In-band everywhere => licensable.
import sys, runpy
sys.path.insert(0, "/root/repo")
CKPTS = ",".join([
    "/tmp/kdpc_train_parity/semitrained_teacher_s0_step2000.msgpack",
    "/tmp/kdpc_train_parity/semitrained_teacher_s0_step4500.msgpack",
    "/tmp/kdpc_train_parity/semitrained_teacher_s0_step9000.msgpack",
    "/tmp/kdpc_train_parity/semitrained_teacher.msgpack",
    "/root/repo/evidence/checkpoints/semitrained_teacher.msgpack",
    "/tmp/kdpc_train_parity/semitrained_teacher_s1.msgpack",
])
sys.argv = ["regime_curve.py", "--ckpts", CKPTS, "--scenes", "50",
            "--variants", "prod_k24l0,k24l0_cw0,prod_k24l01",
            "--out", "/tmp/kdpc_train_parity/regime_curve_k24.json"]
runpy.run_path("/root/repo/scripts/regime_curve.py", run_name="__main__")
