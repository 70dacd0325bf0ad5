"""Optimizer: AdamW with layer-wise LR decay + grad clipping + schedules.

TPU-native re-design of the reference's optimizer stack:
- layer-decay name→layer mapping mirrors
  `mmcv_custom/layer_decay_optimizer_constructor_vit.py:7-16`
  (pos_embed/patch_embed → layer 0, blocks.i → i+1, rest → depth+1),
  with LR scale `rate^(num_layers-layer_id-1)` where num_layers = depth+2;
- no weight decay for 1-dim params / biases / pos_embed (same file :44-47);
- global-norm grad clip 5.0 (`main_pretrain.py:767,786`);
- warmup+cosine (pretrain) / warmup+poly (seg finetune) schedules.

torch.AdamW semantics: update = -lr_g*(adam_dir + wd*p) with lr_g = base_lr *
layer_scale — so the layer scale multiplies both the adam step AND the decay
term; the optax chain below reproduces that ordering exactly.
"""

from __future__ import annotations

import re
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mtp_tpu.utils.config import OptimizerConfig, ScheduleConfig


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def make_schedule(cfg: ScheduleConfig, base_lr: float) -> optax.Schedule:
    warm = cfg.warmup_steps
    rest = max(cfg.total_steps - warm, 1)
    min_lr = base_lr * cfg.min_lr_ratio

    if cfg.kind == "cosine":
        main = optax.cosine_decay_schedule(base_lr, rest, alpha=cfg.min_lr_ratio)
    elif cfg.kind == "poly":
        def main(step):
            frac = jnp.clip(step / rest, 0.0, 1.0)
            return (base_lr - min_lr) * (1 - frac) ** cfg.poly_power + min_lr
    elif cfg.kind == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(cfg.kind)

    if warm == 0:
        return main
    warmup = optax.linear_schedule(base_lr * cfg.warmup_ratio, base_lr, warm)
    return optax.join_schedules([warmup, main], [warm])


# ---------------------------------------------------------------------------
# Layer-decay scales
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


_BLOCK_RX = re.compile(r"(?:^|/)blocks_(\d+)(?:/|$)")


def vit_layer_id(path_str: str, num_layers: int) -> int:
    """Map a param path to its layer-decay id (reference
    `get_num_layer_for_vit`).  num_layers = depth + 2."""
    if ("pos_embed" in path_str or "cls_token" in path_str
            or "mask_token" in path_str or "patch_embed" in path_str):
        return 0
    m = _BLOCK_RX.search(path_str)
    if m:
        return int(m.group(1)) + 1
    return num_layers - 1


def layer_decay_scales(params: Any, depth: int, rate: float,
                       layer_id_fn: Callable[[str, int], int] = vit_layer_id) -> Any:
    """Pytree of per-leaf LR multipliers `rate^(num_layers - id - 1)`."""
    num_layers = depth + 2

    def one(path, leaf):
        lid = layer_id_fn(_path_str(path), num_layers)
        return rate ** (num_layers - lid - 1)

    return jax.tree_util.tree_map_with_path(one, params)


def wd_mask(params: Any) -> Any:
    """True where weight decay applies: ndim>1 and not a pos-embed table.
    (Reference: no decay for 1-dim params, biases, pos_embed.)"""

    def one(path, leaf):
        s = _path_str(path)
        if leaf.ndim <= 1 or s.endswith("bias") or "pos_embed" in s:
            return False
        # relative-position tables are 2-D but norm-free lookup tables; the
        # reference decays them (they are plain nn.Parameters with ndim 2), so
        # we decay them too for parity.
        return True

    return jax.tree_util.tree_map_with_path(one, params)


def _scale_by_pytree(scales: Any) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizerConfig, schedule: optax.Schedule, params: Any,
                   depth: int,
                   layer_id_fn: Callable[[str, int], int] = vit_layer_id,
                   frozen_mask: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW + layer decay, matching torch.optim.AdamW ordering.

    frozen_mask: optional pytree of bools — True leaves get zero updates
    (reference `frozen_stages` behaviour in the CD backbone).
    """
    scales = layer_decay_scales(params, depth, cfg.layer_decay, layer_id_fn)
    chain = [
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask(params)),
        _scale_by_pytree(scales),
        optax.scale_by_learning_rate(schedule),  # also flips sign
    ]
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda f: "frozen" if f else "train", frozen_mask),
        )
    return tx
