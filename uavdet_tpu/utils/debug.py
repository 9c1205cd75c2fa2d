"""Debug guards — the TPU equivalent of the reference's NaN-assert net.

The reference sprinkles ``assert not torch.isnan(x).any()`` through the
data collate, loss path and DySOEM forward (SURVEY §4). Python asserts
can't run inside jit, so this module offers:

* ``enable_nan_debugging()`` — flips ``jax_debug_nans`` (XLA re-runs the
  crashing op un-jitted and points at it),
* ``checked(fn)`` — wraps a jitted fn with ``checkify`` NaN/OOB checks,
* ``assert_finite(tree, name)`` — host-side check for use between steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Wrap fn with checkify float checks; returns (err, out) semantics
    folded into an exception-raising callable."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "tree"):
    """Host-side finiteness check over a pytree (use between steps, not
    inside jit)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
