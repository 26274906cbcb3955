"""Analytic data-parallel cost model for v5e meshes (VERDICT r3 #7).

The multi-chip dryrun runs on host-emulated CPU devices, where wall-clock
reflects host scheduling, not interconnect cost (devices convoy on shared
cores — measured and documented in round 3). This module instead *computes*
the expected collective cost from first principles, the way the public
scaling playbooks do: bytes over the ring divided by ICI bandwidth.

Model (plain bidirectional ring all-reduce over one mesh axis):

    T_allreduce = 2 * (n-1)/n * grad_bytes / W_ring
    W_ring      = 2 links * per-link one-way bandwidth

Constants (public figures for TPU v5e; see jax-ml.github.io/scaling-book,
"Rooflines" chapter):
  * ICI one-way bandwidth per link: 4.5e10 B/s
  * a v5e-8 slice is a 2x4 mesh; a 1-D data axis rides a ring with 2 usable
    link directions per chip.

The per-chip step compute anchor is MEASURED on the real chip (bench.py /
tpu-worker timing of the jitted train step), not estimated from FLOPs —
the measured number already contains the achieved MFU.
"""

from __future__ import annotations

from typing import Dict

V5E_ICI_ONEWAY_BW = 4.5e10   # bytes/s per link per direction
V5E_RING_LINKS = 2           # bidirectional ring over one mesh axis


def allreduce_ms(grad_bytes: float, n_devices: int,
                 link_bw: float = V5E_ICI_ONEWAY_BW,
                 ring_links: int = V5E_RING_LINKS) -> float:
    """Ring all-reduce wall time (ms): each chip moves 2*(n-1)/n of the
    buffer through its ring bandwidth (reduce-scatter + all-gather)."""
    if n_devices <= 1:
        return 0.0
    w_ring = ring_links * link_bw
    return 2.0 * (n_devices - 1) / n_devices * grad_bytes / w_ring * 1e3


def dp_step_model(n_devices: int, param_bytes: float,
                  per_chip_step_ms: float) -> Dict[str, float]:
    """Expected data-parallel step time and scaling efficiency on a v5e
    slice, given the measured single-chip step wall.

    Returns both bounds: `overlapped` assumes XLA overlaps the gradient
    all-reduce with backward compute (it schedules psums as they become
    ready), `serial` assumes no overlap. Real steps land between them —
    for this model family the all-reduce is <2% of the step, so the bounds
    pinch."""
    ar = allreduce_ms(param_bytes, n_devices)
    serial = per_chip_step_ms + ar
    overlapped = max(per_chip_step_ms, ar)
    return {
        "n_devices": n_devices,
        "grad_mbytes": param_bytes / 1e6,
        "allreduce_ms": ar,
        "per_chip_step_ms": per_chip_step_ms,
        "expected_step_ms_overlapped": overlapped,
        "expected_step_ms_serial": serial,
        "scaling_efficiency_overlapped": per_chip_step_ms / overlapped,
        "scaling_efficiency_serial": per_chip_step_ms / serial,
    }


def param_bytes_of(params) -> int:
    """Gradient buffer size of a parameter tree (f32 grads)."""
    import jax

    return sum(x.size * 4 for x in jax.tree_util.tree_leaves(params))
