"""Optimizers & schedules — optax equivalents of the reference's
``configure_optimizers`` (model/_base.py:291-309).

* SGD + momentum (torch SGD trace form: v = μv + g, p -= lr·v — optax's
  ``trace`` matches) or Adam with torch-default betas/eps.
* Optional CyclicLR 'triangular2': base = lr/10, max = lr,
  step_size_up = 4000, amplitude halving per cycle (reference :299-309).
* Gradient accumulation (reference train.py:49, accumulate_grad_batches=2)
  via ``optax.MultiSteps``.
* Optional global-norm gradient clipping (trainer.grad_clip_val —
  Lightning's default clip algorithm is norm-based).
"""

import optax


def cyclic_triangular2(base_lr: float, max_lr: float,
                       step_size_up: int = 4000):
    """torch.optim.lr_scheduler.CyclicLR(mode='triangular2') as an optax
    schedule: lr(t) = base + (max-base) * max(0, 1-x) / 2^(cycle-1)."""

    def schedule(step):
        import jax.numpy as jnp
        cycle = jnp.floor(1 + step / (2 * step_size_up))
        x = jnp.abs(step / step_size_up - 2 * cycle + 1)
        scale = 1.0 / (2.0 ** (cycle - 1))
        return base_lr + (max_lr - base_lr) * jnp.maximum(
            0.0, 1.0 - x) * scale

    return schedule


def build_optimizer(hparams, grad_batches: int = 1,
                    grad_clip_val: float | None = None,
                    steps_per_epoch: int | None = None):
    """Build the optax chain from a model.hparams config node.

    hparams needs: lr, lr_scheduler (bool), optim.{name, momentum}.

    ``steps_per_epoch``: DEVIATION NOTE — the reference returns CyclicLR
    through Lightning's scheduler dict without an ``interval`` key, so
    Lightning steps it once per EPOCH (model/_base.py:299-309); with
    step_size_up=4000 that keeps the reference near base_lr=lr/10
    essentially forever. Default here (None) steps the schedule per
    optimizer step — the behavior CyclicLR is designed for. Pass the
    number of optimizer steps per epoch to reproduce the reference's
    per-epoch stepping for parity training runs (the schedule then sees
    ``step // steps_per_epoch``, i.e. the epoch index).
    """
    lr = float(hparams.lr)
    if hparams.lr_scheduler:
        sched = cyclic_triangular2(lr / 10, lr)
        if steps_per_epoch:
            inner, n = sched, int(steps_per_epoch)
            def sched(step):
                return inner(step // n)
        lr = sched

    name = hparams.optim.name
    if name == "SGD":
        tx = optax.sgd(lr, momentum=float(hparams.optim.momentum))
    elif name == "Adam":
        tx = optax.adam(lr)
    else:
        raise ValueError(f"Invalid optimizer: {name}")

    if grad_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip_val)), tx)

    if grad_batches and grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_batches))

    return tx
