# Extend the licensing regime curve toward the reference's trained regime:
# continue the 18k teacher (held-out 0.1096, sweep-regime 0.0549) for
# 12000 more steps at the decayed lr (18k run ended at 2.5e-4 after two
# halvings). Outputs under _30k tags; the 18k fixture is untouched.
import sys, runpy
for k in [k for k in list(sys.modules) if k.startswith("kd_pointcloud_tpu")]:
    del sys.modules[k]
sys.path.insert(0, "/root/repo")
from kd_pointcloud_tpu.utils.fixtures import fixture_path
ck = fixture_path("semitrained_teacher.msgpack")
sys.argv = ["train_semitrained.py", "teacher", "--steps", "12000",
            "--bs", "4", "--init-from", ck, "--lr", "2.5e-4",
            "--tag", "_30k"]
runpy.run_path("/root/repo/scripts/train_semitrained.py",
               run_name="__main__")
