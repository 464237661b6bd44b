"""LR schedules (ref distillation/nnunetv2/training/lr_scheduler/polylr.py:4-26,
warmup.py:10-101) as optax-compatible schedule functions of the *step* index;
we convert epoch-based reference semantics by steps_per_epoch."""
import numpy as np


def poly_lr(initial_lr: float, max_steps: int, exponent: float = 0.9):
    def schedule(step):
        frac = np.minimum(step, max_steps) / max_steps
        return initial_lr * (1 - frac) ** exponent
    return schedule


def poly_lr_jax(initial_lr: float, max_steps: int, exponent: float = 0.9):
    import jax.numpy as jnp

    def schedule(step):
        frac = jnp.minimum(step, max_steps) / max_steps
        return initial_lr * (1.0 - frac) ** exponent
    return schedule


def linear_warmup_poly(initial_lr: float, max_steps: int, warmup_steps: int,
                       exponent: float = 0.9):
    """Linear warmup from ~0 to initial_lr, then poly decay over the remainder
    (ref lr_scheduler/warmup.py Lin_incr + poly offset variants)."""
    import jax.numpy as jnp

    def schedule(step):
        warm = initial_lr * (step + 1) / max(warmup_steps, 1)
        frac = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1), 0, 1)
        decay = initial_lr * (1.0 - frac) ** exponent
        return jnp.where(step < warmup_steps, warm, decay)
    return schedule


def linear_warmup_cosine(initial_lr: float, max_steps: int, warmup_steps: int):
    import jax.numpy as jnp

    def schedule(step):
        warm = initial_lr * (step + 1) / max(warmup_steps, 1)
        frac = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1), 0, 1)
        decay = initial_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warm, decay)
    return schedule
