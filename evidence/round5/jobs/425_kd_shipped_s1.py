# Seed-1 replication of the shipped-pairing KD two-arm protocol (job 410
# was seed 0): 18k teacher -> lighttoken_res, biDirection_loss_ht g=.3
# b=.8 hint [2,3]. Different student init + batch stream; same held-out
# eval batches. One seed flipping a kd_beats_scratch headline was the
# VERDICT r4 weak-#4 failure pattern — this is the replicate.
import sys, runpy
for k in [k for k in list(sys.modules) if k.startswith("kd_pointcloud_tpu")]:
    del sys.modules[k]
sys.path.insert(0, "/root/repo")
sys.argv = ["kd_effectiveness.py", "--teacher", "teacher",
            "--student", "lighttoken_res", "--loss", "biDirection_loss_ht",
            "--hint", "2,3", "--steps", "3000", "--bs", "4",
            "--seed", "1", "--tag", "_shipped_s1"]
runpy.run_path("/root/repo/scripts/kd_effectiveness.py", run_name="__main__")
