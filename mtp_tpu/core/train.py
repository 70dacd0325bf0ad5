"""Train-step factory: jit-compiled, mesh-sharded training.

Replaces the reference's hand-written DDP loop (main_pretrain.py:689-840) the
TPU way: one jitted step function closed over the optimizer, with the global
batch sharded over the mesh's data axis and params laid out by the TP rules.
XLA compiles the gradient all-reduce over ICI into the step — there is no
process-group or GradScaler code (bf16 needs no loss scaling).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtp_tpu.parallel.mesh import DATA_AXIS, param_shardings


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # BatchNorm running stats ({} if none)
    rng: jax.Array


def create_state(params: Any, tx: optax.GradientTransformation,
                 rng: jax.Array, batch_stats: Any = None,
                 init_opt: bool = True) -> TrainState:
    """init_opt=False leaves opt_state empty — use when `shard_state(...,
    tx=...)` will re-initialize it under jit on the mesh (avoids an eager
    device-by-device init, which is slow on remote-attached devices)."""
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params) if init_opt else (),
        batch_stats=batch_stats if batch_stats is not None else {},
        rng=rng,
    )


# loss_fn(params, batch_stats, batch, rng) -> (loss, (metrics_dict, new_batch_stats))
LossFn = Callable[[Any, Any, Any, jax.Array], Tuple[jax.Array, Tuple[dict, Any]]]


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted train step.  With a mesh, state is kept at the
    rule-derived layout and the batch enters sharded on the data axis."""

    def step(state: TrainState, batch: Any):
        rng, sub = jax.random.split(state.rng)
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, batch_stats=new_stats,
                                  rng=rng)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(None, data),
        out_shardings=(None, repl),
        donate_argnums=(0,) if donate else (),
    )


def _path_segs(kp) -> Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)


def opt_state_shardings(opt_shapes: Any, params_sh: Any, params: Any,
                        repl: NamedSharding) -> Any:
    """Sharding tree for an optimizer state: moment leaves (same trailing
    path + shape as a param, e.g. `mu/backbone/.../kernel`) inherit that
    param's sharding so TP-sharded params get TP-sharded Adam moments;
    everything else (count scalars, schedule state) is replicated."""
    flat = {}
    for (kp, sh), (_, p) in zip(
            jax.tree_util.tree_flatten_with_path(params_sh)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        flat[_path_segs(kp)] = (sh, tuple(p.shape))

    def one(kp, leaf):
        segs = _path_segs(kp)
        for i in range(len(segs)):
            hit = flat.get(segs[i:])
            if hit is not None and hit[1] == tuple(leaf.shape):
                return hit[0]
        return repl

    return jax.tree_util.tree_map_with_path(one, opt_shapes)


def shard_state(mesh: Mesh, state: TrainState,
                tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    """Place a host-initialized TrainState onto the mesh: params by the TP
    rules, scalars replicated.  When `tx` is given the optimizer state is
    re-initialized under jit from the sharded params so the Adam moments
    inherit the parameter shardings (instead of being replicated).

    The jit uses EXPLICIT out_shardings: inferred outputs come back as
    uncommitted single-device arrays, which work until a checkpoint restore
    commits them and the next step sees mixed device sets."""
    psh = param_shardings(mesh, state.params)
    repl = NamedSharding(mesh, P())

    def put_like(tree, sh_tree):
        return jax.tree_util.tree_map(jax.device_put, tree, sh_tree)

    def put_repl(tree):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)

    params = put_like(state.params, psh)
    if tx is not None:
        opt_shapes = jax.eval_shape(tx.init, params)
        osh = opt_state_shardings(opt_shapes, psh, params, repl)
        opt_state = jax.jit(tx.init, out_shardings=osh)(params)
    else:
        opt_state = put_repl(state.opt_state)

    return TrainState(
        step=jax.device_put(state.step, repl),
        params=params,
        opt_state=opt_state,
        batch_stats=put_repl(state.batch_stats),
        rng=jax.device_put(state.rng, repl),
    )


# ---------------------------------------------------------------------------
# Losses (semantics of the reference heads' loss_decode configs)
# ---------------------------------------------------------------------------

def softmax_xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross entropy, labels (B,) int — mmpretrain CrossEntropyLoss."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()


def seg_xent(logits: jax.Array, labels: jax.Array,
             ignore_index: int = 255) -> jax.Array:
    """Pixel cross entropy with ignore_index, averaged over valid pixels
    (mmseg CrossEntropyLoss(avg_non_ignore) semantics).

    logits (B, H, W, K) at label resolution; labels (B, H, W) int.
    """
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe)
    ce = jnp.where(valid, ce, 0.0)
    return ce.sum() / jnp.maximum(valid.sum(), 1)
