"""Persistent TPU worker: executes queued python snippets in one process.

Development harness for this repo's single-TPU environment: killing a JAX
process mid-RPC wedges the remote TPU for minutes, so instead of running many
short-lived scripts, run ONE worker and feed it snippets:

    echo 'print(1+1)' > /tmp/tpuq/001_test.py     # queue a job
    cat /tmp/tpuq/001_test.py.out                  # result (after .done)

Snippets exec in a shared globals dict — imports, params, and compiled
functions persist between jobs. Writing /tmp/tpuq/QUIT stops the worker.

NEVER have a job spawn a subprocess that imports jax (e.g. `subprocess.run
bench.py`): the worker process already holds the single allowed TPU client,
and a second client deadlocks against it (CLAUDE.md). Run scripts INLINE
instead — `runpy.run_path(script, run_name="__main__")` with sys.argv set,
or import the module and call its main().

Round-4 hardening: host memory accumulates across jobs (JAX client buffers +
jit caches live process-wide; the round-4 worker was OOM-killed at 130 GB
anon-rss mid-job, which also risks wedging the remote TPU). The worker now
checks its RSS after every job and, above KDPC_WORKER_RSS_LIMIT_GB (default
60), exits CLEANLY between jobs (rc 3). Run it under scripts/run_tpu_worker.sh,
which restarts on rc 3 and stops on QUIT — restarts also pick up repo code
changes, so prefer the wrapper always.
"""

import io
import sys
sys.path.insert(0, "/root/repo")
import os
import sys
import time
import traceback

QUEUE = "/tmp/tpuq"
os.makedirs(QUEUE, exist_ok=True)

SHARED: dict = {}
CURRENT_JOB: list = [None]


def _watchdog(hard_limit_gb: float):
    """Abort the WORKER if a single job's RSS runs away (round-4 incident:
    job 213 ballooned to 130 GB before the kernel OOM killer fired —
    a controlled exit at the hard limit is strictly safer for the remote
    TPU than an OOM kill mid-RPC). Marks the current job done-with-error
    FIRST so the restarted worker does not re-run the leaky job."""
    import threading
    import time as _t

    def loop():
        while True:
            _t.sleep(20)
            if _rss_gb() > hard_limit_gb:
                job = CURRENT_JOB[0]
                if job:
                    with open(job + ".out", "a") as fd:
                        fd.write(f"\n[rss-abort: worker passed "
                                 f"{hard_limit_gb} GB mid-job]\n")
                    with open(job + ".done", "w") as fd:
                        fd.write("rss-abort")
                print(f"watchdog: rss {_rss_gb():.1f} GB > "
                      f"{hard_limit_gb} GB — hard exit", flush=True)
                os._exit(5)

    threading.Thread(target=loop, daemon=True).start()


def run_one(path: str):
    out_path = path + ".out"
    done_path = path + ".done"
    CURRENT_JOB[0] = path
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = buf
    t0 = time.time()
    try:
        with open(path) as fd:
            code = fd.read()
        exec(compile(code, path, "exec"), SHARED)
        status = "ok"
    except BaseException:
        traceback.print_exc()
        status = "error"
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    with open(out_path, "w") as fd:
        fd.write(buf.getvalue())
        fd.write(f"\n[{status} in {time.time()-t0:.1f}s]\n")
    with open(done_path, "w") as fd:
        fd.write(status)
    CURRENT_JOB[0] = None


def _rss_gb() -> float:
    try:
        with open(f"/proc/{os.getpid()}/statm") as fd:
            return int(fd.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
    except Exception:
        return 0.0


def main():
    rss_limit = float(os.environ.get("KDPC_WORKER_RSS_LIMIT_GB", "60"))
    hard_limit = float(os.environ.get("KDPC_WORKER_RSS_HARD_GB", "90"))
    _watchdog(hard_limit)
    print(f"worker up, pid={os.getpid()}, rss_limit={rss_limit} GB "
          f"(hard mid-job abort at {hard_limit} GB)", flush=True)
    seen = set()
    while True:
        if os.path.exists(os.path.join(QUEUE, "QUIT")):
            print("quit requested", flush=True)
            return
        jobs = sorted(f for f in os.listdir(QUEUE)
                      if f.endswith(".py") and f not in seen
                      and not os.path.exists(os.path.join(QUEUE, f + ".done")))
        for job in jobs:
            # re-scan between jobs so higher-priority (lower-sorted) files
            # queued during a long job are not skipped by a stale list
            if job in seen or os.path.exists(
                    os.path.join(QUEUE, job + ".done")):
                continue
            seen.add(job)
            print(f"running {job}", flush=True)
            run_one(os.path.join(QUEUE, job))
            print(f"done {job} (rss {_rss_gb():.1f} GB)", flush=True)
            rss = _rss_gb()
            if rss > rss_limit:
                # exit CLEANLY between jobs (no in-flight TPU RPC to wedge);
                # the run_tpu_worker.sh wrapper restarts a fresh process
                print(f"rss {rss:.1f} GB > {rss_limit} GB — clean restart",
                      flush=True)
                sys.exit(3)
            break   # force a fresh scan after every job
        time.sleep(0.5)


if __name__ == "__main__":
    main()
