"""Persistent TPU worker: executes queued python snippets in one process.

Development harness for this repo's single-TPU environment: killing a JAX
process mid-RPC wedges the remote TPU for minutes, so instead of running many
short-lived scripts, run ONE worker and feed it snippets:

    echo 'print(1+1)' > /tmp/tpuq/001_test.py     # queue a job
    cat /tmp/tpuq/001_test.py.out                  # result (after .done)

Snippets exec in a shared globals dict — imports, params, and compiled
functions persist between jobs. Writing /tmp/tpuq/QUIT stops the worker.
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


def run_one(path: str):
    out_path = path + ".out"
    done_path = path + ".done"
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


def main():
    print(f"worker up, pid={os.getpid()}", flush=True)
    seen = set()
    while True:
        if os.path.exists(os.path.join(QUEUE, "QUIT")):
            print("quit requested", flush=True)
            return
        jobs = sorted(f for f in os.listdir(QUEUE)
                      if f.endswith(".py") and f not in seen
                      and not os.path.exists(os.path.join(QUEUE, f + ".done")))
        for job in jobs:
            seen.add(job)
            print(f"running {job}", flush=True)
            run_one(os.path.join(QUEUE, job))
            print(f"done {job}", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
