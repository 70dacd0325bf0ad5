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
    elif cfg.kind == "step":
        # reference MultiStepLR (detection finetunes: milestones [8, 11] of
        # 12 epochs, gamma 0.1) expressed as fractions of the post-warmup run
        bounds = {int(round(m * rest)): cfg.step_gamma
                  for m in cfg.step_milestones}
        main = optax.piecewise_constant_schedule(base_lr, bounds)
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
_GROUP_RX = re.compile(r"(?:^|/)block_groups/(rvsa_(\d+)|full)(?:/|$)")
# InternImage scanned-stage layout: stage{s}_layers/l/... with a stacked
# leading layer axis
_STAGE_RX = re.compile(r"(?:^|/)stage(\d+)_layers/")


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
                       layer_id_fn: Callable[[str, int], int] = vit_layer_id,
                       scan_interval: Optional[int] = None) -> Any:
    """Pytree of per-leaf LR multipliers `rate^(num_layers - id - 1)`.

    Scanned backbones get per-leaf *arrays*: the stacked leading axis carries
    the layer index (ViT block_groups: g*interval + pos; InternImage
    stage{s}_layers: stage-cumulative + l), so each slice keeps its exact
    reference scale."""
    num_layers = depth + 2

    # stage depths of a scanned InternImage, recovered from the stacked
    # leading axes (stage s starts at sum of earlier stages' depths)
    stage_depth: dict = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        m = _STAGE_RX.search(_path_str(kp))
        if m:
            stage_depth[int(m.group(1))] = leaf.shape[0]

    def one(path, leaf):
        s = _path_str(path)
        m = _GROUP_RX.search(s)
        if m is not None and scan_interval is not None:
            pos = scan_interval - 1 if m.group(1) == "full" else int(m.group(2))
            G = leaf.shape[0]
            ids = jnp.arange(G) * scan_interval + pos + 1
            sc = rate ** (num_layers - ids - 1)
            return sc.reshape((G,) + (1,) * (leaf.ndim - 1)).astype(leaf.dtype)
        m = _STAGE_RX.search(s)
        if m is not None:
            st = int(m.group(1))
            G = leaf.shape[0]
            start = sum(d for ss, d in stage_depth.items() if ss < st)
            ids = start + jnp.arange(G) + 1
            sc = rate ** (num_layers - ids - 1)
            return sc.reshape((G,) + (1,) * (leaf.ndim - 1)).astype(leaf.dtype)
        lid = layer_id_fn(s, num_layers)
        return rate ** (num_layers - lid - 1)

    return jax.tree_util.tree_map_with_path(one, params)


def wd_mask(params: Any) -> Any:
    """True where weight decay applies: effective ndim>1, not bias/pos-embed/
    norm-scale/layer-scale.  (Reference: no decay for 1-dim params, biases,
    pos_embed.)  Leaves under the scanned block_groups layout carry a stacked
    leading axis, so their effective ndim is one less."""

    def one(path, leaf):
        s = _path_str(path)
        stacked = "block_groups/" in s + "/" or _STAGE_RX.search(s) is not None
        ndim = leaf.ndim - (1 if stacked else 0)
        if (ndim <= 1 or s.endswith("bias") or s.endswith("scale")
                or "pos_embed" in s or s.endswith("gamma_1")
                or s.endswith("gamma_2")):
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
                   frozen_mask: Optional[Any] = None,
                   scan_interval: Optional[int] = None) -> optax.GradientTransformation:
    """AdamW + layer decay, matching torch.optim.AdamW ordering.

    frozen_mask: optional pytree of bools — True leaves get zero updates
    (reference `frozen_stages` behaviour in the CD backbone).
    scan_interval: block-group interval when the backbone uses the scanned
    layout (per-slice layer-decay scales).
    """
    scales = layer_decay_scales(params, depth, cfg.layer_decay, layer_id_fn,
                                scan_interval)
    chain = [
        # clip_norm <= 0 disables clipping (reference finetunes don't clip;
        # pretraining clips at 5.0, main_pretrain.py:767)
        optax.clip_by_global_norm(cfg.clip_norm) if cfg.clip_norm > 0
        else optax.identity(),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask(params)),
        _scale_by_pytree(scales),
        optax.scale_by_learning_rate(schedule),  # also flips sign
    ]
    if frozen_mask is not None:
        # zero out updates for frozen leaves (multi_transform's MaskedNode
        # placeholders don't compose with the pytree-scale transform)
        chain.append(_scale_by_pytree(jax.tree_util.tree_map(
            lambda f: 0.0 if f else 1.0, frozen_mask)))
    return optax.chain(*chain)
