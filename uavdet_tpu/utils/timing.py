"""Device timing helpers for the tunneled 'axon' TPU platform.

On axon, ``block_until_ready`` returns BEFORE device execution completes
(CLAUDE.md gotcha), so the only reliable sync is fetching a value to the
host; the device executes queued programs in order, so syncing the last
result times all of them. Every bench/probe in this repo must time
through these helpers — a fix to the sync discipline then lands once.
"""

import time

import numpy as np


def fetch_sync(v):
    """Synchronize by fetching ONE element of (the first leaf of) ``v``
    to the host. Works for arrays, tuples/lists, and pytrees. The slice
    happens ON DEVICE before the host fetch — np.asarray on the full
    leaf would drag the whole array through the tunnel."""
    import jax

    leaf = jax.numpy.asarray(jax.tree_util.tree_leaves(v)[0])
    return np.asarray(leaf.ravel()[:1])


def time_total(run, sync, iters, warmup):
    """TOTAL elapsed seconds for ``iters`` dispatches of ``run`` (one
    value-fetch sync at the end — dispatch stays pipelined, which is the
    throughput-measurement regime). ``sync`` defaults to fetch_sync."""
    sync = sync or fetch_sync
    sync(run())
    for _ in range(warmup):
        sync(run())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    sync(out)
    return time.perf_counter() - t0


def time_per_iter(run, sync=None, iters=20, warmup=3):
    """PER-ITERATION seconds (the probe-script convention)."""
    return time_total(run, sync, iters, warmup) / iters
