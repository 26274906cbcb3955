# /verify drive: single-chip compile check of the driver entry.
import sys, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print(json.dumps({"entry_ok": True, "shape": list(out.shape),
                  "finite": bool(jnp.isfinite(out).all())}))
