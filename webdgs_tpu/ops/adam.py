"""Per-group Adam with visibility gating — the reference's optimizer.

Reproduces src/shaders/adam.wgsl exactly in its default ("parity") mode:

* classic Adam WITHOUT bias correction (adam.wgsl:53-65; SURVEY.md Q3),
  no learning-rate schedule;
* per-group learning rates (defaults in src/renderers/adam-config.ts:12-21);
* visibility gating: a Gaussian whose ``tile_counts`` is zero is skipped
  entirely — parameters AND moments stay frozen (adam.wgsl:74-76);
* the quaternion is re-normalized after its update (adam.wgsl:124-126);
* SH: only the DC coefficient (3 of 48 floats) is trained, with lr_color
  applied to the raw dL/dcolor — the reference omits the SH_C0 basis factor
  (adam.wgsl:160-174; SURVEY.md Q2) — and f_rest stays frozen.

Improvement toggles (off by default for parity): ``bias_correction`` and
``full_sh`` (train all SH coefficients from true autodiff gradients, the
rest bands scaled by ``sh_rest_lr_scale`` as in canonical 3DGS).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AdamHyperparameters:
    """Defaults: src/renderers/adam-config.ts:12-21."""

    lr_pos: float = 0.00016
    lr_color: float = 0.0025
    lr_opacity: float = 0.05
    lr_scale: float = 0.005
    lr_rot: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    bias_correction: bool = False
    full_sh: bool = False
    sh_rest_lr_scale: float = 0.05
    # optional canonical-3DGS exponential position-lr decay (the reference
    # has no schedule at all, SURVEY.md Q3); 0 disables
    lr_pos_final: float = 0.0
    lr_pos_decay_steps: int = 30_000

    def group_lrs(self) -> dict[str, float]:
        return {
            "means": self.lr_pos,
            "quats": self.lr_rot,
            "log_scales": self.lr_scale,
            "opacity_logits": self.lr_opacity,
            "sh": self.lr_color,
        }


@flax.struct.dataclass
class AdamState:
    m: dict[str, jax.Array]
    v: dict[str, jax.Array]
    iteration: jax.Array  # () i32


def init_adam_state(params: dict[str, jax.Array]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros,
                     v=jax.tree.map(jnp.zeros_like, params),
                     iteration=jnp.int32(0))


def adam_step(
    params: dict[str, jax.Array],
    grads: dict[str, jax.Array],
    state: AdamState,
    hp: AdamHyperparameters,
    tile_counts: jax.Array,  # (N,) i32 — 0 means invisible this step
) -> tuple[dict[str, jax.Array], AdamState]:
    visible = tile_counts > 0  # (N,)
    it = state.iteration + 1

    lr_pos = hp.lr_pos
    if hp.lr_pos_final > 0.0:
        frac = jnp.clip(it.astype(jnp.float32) / hp.lr_pos_decay_steps,
                        0.0, 1.0)
        lr_pos = hp.lr_pos * (hp.lr_pos_final / hp.lr_pos) ** frac

    if hp.bias_correction:
        t = it.astype(jnp.float32)
        corr1 = 1.0 - hp.beta1 ** t
        corr2 = 1.0 - hp.beta2 ** t
    else:
        corr1 = corr2 = 1.0

    new_params, new_m, new_v = {}, {}, {}
    lrs = hp.group_lrs()
    for key in params:
        p, g = params[key], grads[key]
        m, v = state.m[key], state.v[key]
        lr_val = lr_pos if key == "means" else lrs[key]
        lr = lr_val * jnp.ones(p.shape[1:] if p.ndim > 1 else (),
                               dtype=p.dtype)
        if key == "sh":
            if hp.full_sh:
                band = jnp.concatenate([
                    jnp.ones((1,), p.dtype),
                    jnp.full((15,), hp.sh_rest_lr_scale, p.dtype)])
                lr = lrs["sh"] * band[:, None]
            else:
                # parity: DC only (adam.wgsl:160-174)
                dc_only = jnp.zeros((16, 1), p.dtype).at[0].set(1.0)
                lr = lrs["sh"] * dc_only
                g = g * (dc_only != 0.0)

        mask = visible.reshape((-1,) + (1,) * (p.ndim - 1))
        m_new = hp.beta1 * m + (1.0 - hp.beta1) * g
        v_new = hp.beta2 * v + (1.0 - hp.beta2) * g * g
        step = -lr * (m_new / corr1) / (jnp.sqrt(v_new / corr2) + hp.epsilon)
        p_new = p + step
        if key == "quats":
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(p_new * p_new, axis=-1, keepdims=True), 1e-24))
            p_new = p_new / norm

        new_params[key] = jnp.where(mask, p_new, p)
        new_m[key] = jnp.where(mask, m_new, m)
        new_v[key] = jnp.where(mask, v_new, v)

    return new_params, AdamState(m=new_m, v=new_v, iteration=it)
