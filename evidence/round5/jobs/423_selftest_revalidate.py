# Revalidate selftest after the round-5 review fixes (fixtures alias +
# staleness refresh, _in_band simplification, fixture_path ckpt resolution).
# Evict cached package modules so the worker picks up the edits.
import sys, runpy
for k in [k for k in list(sys.modules) if k.startswith("kd_pointcloud_tpu")]:
    del sys.modules[k]
sys.path.insert(0, "/root/repo")
sys.argv = ["selftest_tpu.py", "--metrics", "--fg"]
try:
    runpy.run_path("/root/repo/scripts/selftest_tpu.py", run_name="__main__")
except SystemExit as e:
    print(f"exit: {e.code}")
