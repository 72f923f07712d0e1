"""XMem training: losses + one jitted multi-frame step with data parallelism.

Rebuild of the reference's only training/distributed component
(``XMem/model/trainer.py:20-234``, ``XMem/model/losses.py:8-46``,
``XMem/train.py:25`` DDP): the torch DDP/NCCL wrapper becomes a mesh-axis
sharding — the batch is laid out over the ``dp`` axis and XLA inserts the
gradient all-reduce over ICI.

TPU-first deviations from the reference loop:
- the whole T-frame unroll (encode key once, grow value memory, per-frame
  read/segment/encode_value) is ONE jitted step — no per-frame kernel
  launches;
- ``num_ref_frames`` memory capping gathers a static-length random frame
  subset (frame 0 + randperm, exactly ``trainer.py:82-96``) instead of
  torch's dynamic stacking; 0 keeps every previous frame (identical
  whenever ``T - 1 <= num_ref``, e.g. the s0 curriculum);
- bootstrapped CE's top-p hard-pixel fraction is a traced value: the
  per-pixel losses are sorted once and averaged under an iota<k mask
  instead of torch.topk with a python-int k (``losses.py:22-43``).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.models.xmem import blocks as B
from d3fields_tpu.models.xmem import memory as M
from d3fields_tpu.models.xmem import network as N

Array = jax.Array


# ---------------------------------------------------------------------------
# losses (XMem/model/losses.py)
# ---------------------------------------------------------------------------

def dice_loss(masks: Array, cls_gt: Array) -> Array:
    """masks (B, O, H, W) probabilities (no bg); cls_gt (B, H, W) int
    (0 = bg). Reference ``dice_loss`` (``losses.py:8-19``)."""
    B_, O = masks.shape[:2]
    m = masks.reshape(B_, O, -1)
    gt = jax.nn.one_hot(cls_gt.reshape(B_, -1) - 1, O, axis=1)  # (B, O, HW)
    num = 2.0 * (m * gt).sum(-1)
    den = m.sum(-1) + gt.sum(-1)
    return (1.0 - (num + 1.0) / (den + 1.0)).mean()


def bootstrapped_ce(logits: Array, cls_gt: Array, it: Array,
                    start_warm: int, end_warm: int,
                    top_p: float = 0.15) -> Array:
    """logits (B, O+1, H, W); cls_gt (B, H, W). Hard-pixel mining CE
    (``BootstrappedCE``, ``losses.py:22-43``), jit-safe for traced ``it``."""
    B_ = logits.shape[0]
    O1 = logits.shape[1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    raw = -jnp.take_along_axis(
        lp, cls_gt[:, None].astype(jnp.int32), axis=1
    )[:, 0].reshape(-1)
    n = raw.shape[0]
    frac = jnp.clip(
        top_p + (1.0 - top_p) * (end_warm - it) / (end_warm - start_warm),
        top_p, 1.0,
    )
    frac = jnp.where(it < start_warm, 1.0, frac)
    k = jnp.round(frac * n)
    sorted_desc = jnp.sort(raw)[::-1]
    sel = (jnp.arange(n) < k).astype(raw.dtype)
    return (sorted_desc * sel).sum() / jnp.maximum(k, 1.0)


# ---------------------------------------------------------------------------
# multi-frame forward + loss
# ---------------------------------------------------------------------------

def select_ref_frames(ti: int, num_ref_frames: int, key: Array) -> Array:
    """Memory-frame indices for query frame ``ti``: frame 0 always, plus
    ``num_ref_frames - 1`` random distinct frames from ``[1, ti)`` —
    exactly the reference's sampling (``trainer.py:87-96``:
    ``cat([zeros(1), randperm(ti-1)[:num_ref-1] + 1])``). Only called when
    ``ti > num_ref_frames`` so the slice is full-length; the result has a
    STATIC length of ``num_ref_frames`` (ti is a Python int — the T-frame
    rollout is unrolled), keeping the gathered memory shapes static."""
    perm = jax.random.permutation(key, ti - 1)[: num_ref_frames - 1] + 1
    return jnp.concatenate([jnp.zeros((1,), perm.dtype), perm])


def sequence_loss(params, batch: Dict[str, Array], it: Array,
                  cfg: XMemConfig, rng: Optional[Array] = None, *,
                  start_warm: int = 20000, end_warm: int = 70000,
                  deep_update_prob: float = 0.2,
                  num_ref_frames: int = 0,
                  return_probs: bool = False) -> Tuple[Array, Dict[str, Array]]:
    """One sample's T-frame rollout loss (vmapped over batch by the step).

    batch: frames (T, H, W, 3), first_gt (O, H, W) one-hot,
    cls_gt (T, H, W) int, selector (O,) 1.0 for live objects.
    Mirrors ``XMemTrainer.do_pass`` (``trainer.py:56-160``).

    ``num_ref_frames > 0`` caps the attention memory per query frame at
    that many reference frames, sampled like the reference
    (``trainer.py:82-96``): all previous frames while ``ti <= num_ref``,
    else frame 0 + random others. 0 = keep every previous frame (the
    natural static-shape choice for short clips; identical to the capped
    path whenever ``T - 1 <= num_ref``).
    """
    frames = batch["frames"]
    first_gt = batch["first_gt"]
    cls_gt = batch["cls_gt"]
    selector = batch["selector"]
    T = frames.shape[0]
    O = first_gt.shape[0]

    key, shrinkage, selection, f16, f8, f4 = N.encode_key(params, frames)
    h, w = key.shape[1:3]
    hidden = jnp.zeros((O, h, w, cfg.hidden_dim))

    v0, hidden = N.encode_value(
        params, frames[0], f16[0], hidden, first_gt, is_deep_update=True
    )  # (O, h, w, CV)
    values = [v0]

    def flat_k(t):  # (CK, hw)
        return key[t].reshape(h * w, -1).T

    total = 0.0
    aux: Dict[str, Array] = {}
    for ti in range(1, T):
        if num_ref_frames > 0 and ti > num_ref_frames:
            sel_key = (jax.random.fold_in(rng, 7919 + ti) if rng is not None
                       else jax.random.fold_in(jax.random.PRNGKey(1), ti))
            sel = select_ref_frames(ti, num_ref_frames, sel_key)
            ref_k = (key[sel].reshape(num_ref_frames * h * w, -1).T)
            ref_s = shrinkage[sel].reshape(-1)
            # values is a python list (one entry per past frame); stack so
            # the traced index vector can gather it
            ref_v = (jnp.stack(values)[sel]           # (R, O, h, w, CV)
                     .transpose(1, 4, 0, 2, 3)
                     .reshape(O, -1, num_ref_frames * h * w))
        else:
            ref_k = jnp.concatenate([flat_k(t) for t in range(ti)], axis=1)
            ref_s = jnp.concatenate(
                [shrinkage[t].reshape(-1) for t in range(ti)], axis=0
            )
            ref_v = jnp.concatenate(
                [v.reshape(O, h * w, -1).transpose(0, 2, 1) for v in values],
                axis=2,
            )  # (O, CV, ti*hw)
        qk = flat_k(ti)
        qe = selection[ti].reshape(h * w, -1).T
        sim = M.similarity(ref_k, ref_s, qk, qe)
        aff = jax.nn.softmax(sim, axis=0)  # train-time: full softmax
        readout = jnp.einsum("ocl,ln->ocn", ref_v, aff)
        readout = readout.transpose(0, 2, 1).reshape(O, h, w, -1)

        new_hidden, logits, prob_with_bg = N.segment(
            params, f16[ti], f8[ti], f4[ti], hidden, readout,
            h_out=(ti < T - 1),
        )
        # selector masks dead objects before soft aggregation
        prob = jax.nn.sigmoid(logits) * selector[:, None, None]
        prob_with_bg = B.soft_aggregate(prob, axis=0)
        # CE consumes the aggregation's log-odds logits, exactly as the
        # reference (aggregate(..., return_logits=True), network.py:118)
        clipped = jnp.clip(prob_with_bg, 1e-7, 1.0 - 1e-7)
        logits_with_bg = jnp.log(clipped / (1.0 - clipped))

        total = total + bootstrapped_ce(
            logits_with_bg[None], cls_gt[ti][None], it, start_warm, end_warm
        )
        total = total + dice_loss(prob_with_bg[1:][None], cls_gt[ti][None])

        if ti < T - 1:
            hidden = new_hidden
            # the reference deep-updates the hidden state on a Bernoulli
            # (deep_update_prob) coin per frame during training
            # (XMem/model/trainer.py:118)
            v16, deep_hidden = N.encode_value(
                params, frames[ti], f16[ti], hidden, prob_with_bg[1:],
                is_deep_update=True,
            )
            if rng is not None:
                coin = jax.random.bernoulli(
                    jax.random.fold_in(rng, ti), deep_update_prob
                )
                hidden = jnp.where(coin, deep_hidden, hidden)
            else:
                hidden = deep_hidden
            values.append(v16)
    aux["num_frames"] = jnp.asarray(T)
    if return_probs:
        if T < 2:
            raise ValueError("return_probs needs a clip of >= 2 frames "
                             "(frame 0 only seeds the memory)")
        # last frame's aggregated probabilities, for training image dumps
        # (the reference's image_saver pipeline, XMem/util/image_saver.py)
        aux["last_prob"] = prob_with_bg
    # the reference sums per-frame ce+dice without dividing by frame count
    # (losses.py:60-66); normalizing would shrink gradients as T grows
    return total, aux


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    it: Array


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.05,
                   steps: Tuple[int, ...] = (80000, 100000),
                   gamma: float = 0.1) -> optax.GradientTransformation:
    """AdamW + MultiStepLR (``trainer.py:40-44``)."""
    sched = optax.piecewise_constant_schedule(
        lr, {int(s): gamma for s in steps}
    )
    return optax.adamw(sched, weight_decay=weight_decay)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _train_step(state: TrainState, batch: Dict[str, Array],
                cfg: XMemConfig, optimizer, *, num_ref_frames: int = 0,
                start_warm: int = 20000,
                end_warm: int = 70000) -> Tuple[TrainState, Dict]:
    """One DP step: batch axes lead every array; lay them out over a mesh
    'dp' axis (NamedSharding) and XLA all-reduces the vmapped grads over
    ICI — the DDP equivalent (``XMem/train.py:25``, ``trainer.py:27-31``)."""

    def mean_loss(params):
        bsz = jax.tree.leaves(batch)[0].shape[0]
        step_key = jax.random.fold_in(jax.random.PRNGKey(0), state.it)
        keys = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(
            jnp.arange(bsz)
        )
        losses, aux = jax.vmap(
            lambda b, k: sequence_loss(
                params, b, state.it, cfg, k,
                num_ref_frames=num_ref_frames,
                start_warm=start_warm, end_warm=end_warm,
            )
        )(batch, keys)
        return losses.mean(), aux

    (loss, aux), grads = jax.value_and_grad(mean_loss, has_aux=True)(
        state.params
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.it + 1), {"loss": loss}


_STEP_STATICS = ("cfg", "optimizer", "num_ref_frames", "start_warm",
                 "end_warm")
train_step = functools.partial(jax.jit, static_argnames=_STEP_STATICS)(
    _train_step)
# donating variant for training LOOPS (apps/train_xmem.py): params +
# optimizer state update in place instead of double-buffering every step.
# The non-donating train_step stays for callers that keep the input state
# alive after the call (equivalence tests, one-shot probes).
train_step_donated = functools.partial(
    jax.jit, static_argnames=_STEP_STATICS, donate_argnames=("state",)
)(_train_step)


# ---------------------------------------------------------------------------
# checkpointing (reference trainer.py:160-202)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: TrainState) -> None:
    import pickle

    with open(path, "wb") as f:
        pickle.dump(
            {
                "it": int(state.it),
                "params": jax.tree.map(np.asarray, state.params),
                "opt_state": jax.tree.map(
                    lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                    state.opt_state,
                ),
            },
            f,
        )


def load_checkpoint(path: str, optimizer) -> TrainState:
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    params = jax.tree.map(jnp.asarray, d["params"])
    ref = optimizer.init(params)
    opt_state = jax.tree.map(
        lambda r, s: jnp.asarray(s) if hasattr(r, "shape") else s,
        ref, d["opt_state"],
    )
    return TrainState(params, opt_state, jnp.asarray(d["it"], jnp.int32))
