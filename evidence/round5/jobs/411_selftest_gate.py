# Post-kernel-change gate (CLAUDE.md): selftest --metrics --fg on the chip.
import sys, runpy, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_kdpc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.argv = ["selftest_tpu.py", "--metrics", "--fg"]
try:
    runpy.run_path("/root/repo/scripts/selftest_tpu.py", run_name="__main__")
except SystemExit as e:
    print("exit:", e.code)
