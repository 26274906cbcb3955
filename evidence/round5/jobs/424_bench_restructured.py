# Full bench.py end-to-end after the round-5 restructure (per-variant error
# isolation, truthful rep counts, ledger printed against the headline
# median). Validates the artifact-of-record pipeline the driver will run.
import sys, runpy
for k in [k for k in list(sys.modules) if k.startswith("kd_pointcloud_tpu")]:
    del sys.modules[k]
sys.path.insert(0, "/root/repo")
sys.argv = ["bench.py"]
runpy.run_path("/root/repo/bench.py", run_name="__main__")
