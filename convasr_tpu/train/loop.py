"""Training step and state (SPMD, jit-compiled).

Behavior spec: the reference hot loop train.py:733-830 — forward, CTC loss
per head normalized by char-target length (models.py:320-325), loss weighting
/ gradient accumulation, global-norm clipping, inf/nan-loss skip
(train.py:769, 795-798), entropy diagnostics (models.py:645-657).

TPU-first design: one jitted `train_step` carries (params, batch_stats,
opt_state); the batch is sharded over the mesh 'data' axis and GSPMD inserts
the gradient all-reduce. Gradient accumulation is `optax.MultiSteps`
(train.py:754-755, 776-782). The inf/nan guard selects the old state with
`jnp.where` — no host round-trip in the step.
"""
import typing

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.ctc_pallas import ctc_loss_auto as ctc_loss


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: typing.Any
    batch_stats: typing.Any
    opt_state: typing.Any


def entropy(log_probs, lengths=None, dim=-1, eps=1e-9):
    """Mean per-frame posterior entropy (spec: models.py:645-657);
    log_probs (B, T, C), lengths (B,) int frames."""
    e = -jnp.sum(jnp.exp(log_probs) * log_probs, axis=dim)  # (B, T)
    if lengths is None:
        return jnp.mean(e, axis=-1)
    mask = jnp.arange(e.shape[-1])[None, :] < lengths[:, None]
    return jnp.sum(e * mask, axis=-1) / (eps + lengths.astype(e.dtype))


def weighted_mean_entropy(log_probs, lengths=None, eps=1e-9, eps_id=-1):
    """Silence-weighted posterior entropy — a CER-correlated uncertainty
    measure (spec: models.py:660-674). log_probs (B, T, C); eps_id is the
    blank class (-1 = last)."""
    prob = jnp.exp(log_probs)
    e = -jnp.sum(prob * log_probs, axis=-1)          # (B, T)
    weights = 1.0 - prob[..., eps_id]
    if lengths is not None:
        mask = jnp.arange(e.shape[-1])[None, :] < lengths[:, None]
        weights = weights * mask
    return jnp.sum(e * weights, axis=-1) / (eps + jnp.sum(weights, axis=-1))


def margin(log_probs, axis=-1):
    """Top-1 minus top-2 posterior probability per frame (spec: models.py:677)."""
    top2 = jax.lax.top_k(jnp.exp(log_probs), 2)[0]
    return top2[..., 0] - top2[..., 1]


MULAW_MU = 255.0


def undo_int16_transport(x):
    """Audio may ride the host->device link compressed (the link is the
    train bottleneck for corpora too big for --device-cache — see
    scripts/train_feed_probe.py):
      int16  — PCM, /32767 on device (audio/io.py SMAX); HALF the bytes,
               bit-exact for int16-sourced corpora
      uint8  — mu-law (mu=255, G.711-style, the codec 8 kHz telephony audio
               was already shaped by); QUARTER the bytes, ~38 dB SNR
    float inputs (features or f32 transport) pass through."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) / jnp.float32(32767.0)
    if x.dtype == jnp.uint8:
        y = (x.astype(jnp.float32) - 128.0) / 127.0   # [-1, 1] companded
        return jnp.sign(y) * (jnp.exp(jnp.abs(y) * jnp.log1p(MULAW_MU))
                              - 1.0) / MULAW_MU
    return x


def compute_losses(outputs, y, ylen, bpe_only: bool = False):
    """Per-utterance CTC loss summed over heads, each normalized by the
    FIRST head's target length (spec: models.py:320-325)."""
    losses = []
    for i, lp in enumerate(outputs['log_probs']):
        blank = lp.shape[-1] - 1
        li = ctc_loss(lp, y[:, i], outputs['olen'][i], ylen[:, i], blank=blank)
        losses.append(li / jnp.maximum(ylen[:, 0].astype(jnp.float32), 1.0))
    return sum(losses[1:]) if bpe_only and len(losses) > 1 else sum(losses)


def freeze_mask(params, freeze_backbone: int = 0, freeze_decoder0: bool = False,
                freeze_frontend: bool = False):
    """Boolean mask tree: True = trainable (spec: JasperNet.freeze,
    models.py:328-339 — freeze the first N backbone blocks and/or the char
    decoder head; freeze_frontend freezes a learned wav2vec frontend's params,
    the usual trained-frontend finetune setup)."""
    def rule(path, leaf):
        name = jax.tree_util.keystr(path)
        for i in range(freeze_backbone):
            if f"'block{i}'" in name or f'block{i}/' in name or f'.block{i}.' in name \
                    or name.startswith(f"['block{i}']"):
                return False
        if freeze_decoder0 and 'decoder' in name and 'head0' in name:
            return False
        if freeze_frontend and "'frontend'" in name:
            return False
        return True
    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer_with_accum(base_optimizer, max_grad_norm: float = 0.0,
                              accumulate_steps: int = 1, trainable_mask=None):
    tx = base_optimizer
    if trainable_mask is not None:
        # frozen params get ZERO updates (spec: requires_grad=False,
        # models.py:338-339): the optimizer runs on trainable leaves only and
        # set_to_zero kills the rest
        frozen_mask = jax.tree.map(lambda t: not t, trainable_mask)
        tx = optax.chain(optax.masked(tx, trainable_mask),
                         optax.masked(optax.set_to_zero(), frozen_mask))
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def make_train_step(model, optimizer, bpe_only: bool = False,
                    skip_nonfinite: bool = True, blank_penalty: float = 0.0):
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: dict(x (B,T) or (B,T,C), xlen (B,), y (B,H,L), ylen (B,H)).

    blank_penalty > 0 adds `penalty * mean_valid_frames p(blank)` to the
    loss — a train-time remedy for PEAKY CTC (VERDICT r4 #7): plain CTC
    converges to blank-dominated posteriors whose long intra-word blank runs
    the greedy generator decodes as word boundaries, which round 4 patched at
    decode time with --replace-blank-series 20. Penalizing blank mass makes
    the model hold each character through its full acoustic span, so blank
    runs inside words stay short and DEFAULT decode flags produce the same
    WER (tests/test_wer_harness.py trains with it; measured
    scripts/blank_penalty_probe.py). The CTC alignment sum is unchanged in
    structure — the penalty only reweights which alignments win.
    """

    def loss_fn(params, batch_stats, batch, key):
        variables = {'params': params, 'batch_stats': batch_stats}
        # three independent training rng streams: dropout masks, SpecAugment
        # masks, and the frontend dither (reference applies dither only in
        # training, models.py:571-572)
        k_dropout, k_augment, k_dither = jax.random.split(key, 3)
        outputs, mutated = model.apply(
            variables, undo_int16_transport(batch['x']), xlen=batch['xlen'],
            training=True,
            mutable=['batch_stats'], rngs={'dropout': k_dropout, 'augment': k_augment},
            dither_key=k_dither)
        loss_per_utt = compute_losses(outputs, batch['y'], batch['ylen'], bpe_only=bpe_only)
        loss = jnp.mean(loss_per_utt)
        lp0 = outputs['log_probs'][0]
        if blank_penalty:
            olen0 = outputs['olen'][0]
            mask = jnp.arange(lp0.shape[1])[None, :] < olen0[:, None]
            p_blank = jnp.exp(lp0[..., -1].astype(jnp.float32))
            loss = loss + blank_penalty * jnp.sum(p_blank * mask) \
                / jnp.maximum(jnp.sum(mask), 1)
        ent = jnp.mean(entropy(lp0, outputs['olen'][0]))
        return loss, (mutated['batch_stats'], ent)

    def train_step(state: TrainState, batch, key):
        (loss, (new_stats, ent)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key)

        finite = jnp.isfinite(loss)
        if skip_nonfinite:
            grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            # on non-finite loss keep everything (spec: train.py:769, 795-798)
            new_params = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                                      new_params, state.params)
            new_opt_state = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                                         new_opt_state, state.opt_state)
            new_stats = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                                     new_stats, state.batch_stats)
        grad_norm = optax.global_norm(grads)
        # weight norm: the reference logs weight/grad norms to tensorboard
        # (train.py:60-117); a global scalar is cheap on device
        weight_norm = optax.global_norm(new_params)
        metrics = dict(loss=loss, entropy=ent, grad_norm=grad_norm,
                       weight_norm=weight_norm,
                       finite=finite.astype(jnp.float32))
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt_state), metrics

    return train_step


def make_eval_step(model, bpe_only: bool = False, forward_x_only: bool = False):
    """forward_x_only drops the xlen masks (masking-debug flag,
    reference --forward-x-only, train.py:1026)."""
    def eval_step(params, batch_stats, batch):
        outputs = model.apply({'params': params, 'batch_stats': batch_stats},
                              undo_int16_transport(batch['x']),
                              xlen=None if forward_x_only else batch['xlen'],
                              training=False)
        metrics = {}
        if 'y' in batch and batch['y'] is not None:
            loss_per_utt = compute_losses(outputs, batch['y'], batch['ylen'], bpe_only=bpe_only)
            metrics['loss'] = loss_per_utt
        lp0 = outputs['log_probs'][0]
        metrics['entropy'] = entropy(lp0, outputs['olen'][0])
        metrics['uncertainty'] = weighted_mean_entropy(lp0, outputs['olen'][0])
        return outputs, metrics
    return eval_step


def reset_bn_stats(batch_stats):
    """Zero means / unit vars (spec: models.py:726-733 reset_bn_running_stats_)."""
    def leaf(path, a):
        name = jax.tree_util.keystr(path)
        return jnp.zeros_like(a) if 'mean' in name else jnp.ones_like(a)
    return jax.tree_util.tree_map_with_path(leaf, batch_stats)


def make_bn_adapt_step(model):
    """Re-estimate BN running stats on one adaptation batch (--adapt-bn).

    Reference semantics (train.py:182-186 + models.py:726-733): reset the
    running stats, set `bn.momentum = None` — torch then keeps a CUMULATIVE
    moving average over the adaptation batches — and leave everything but the
    BN modules in eval mode (no dropout, no SpecAugment). Flax BatchNorm only
    does EMA updates, so each batch's statistics are recovered by inverting
    the EMA against the (fixed) reset stats, and the equal-weight cumulative
    average over batches runs explicitly:

        avg_n = avg_{n-1} + (batch_stats - avg_{n-1}) / n

    `n` is 1-based and must be passed as a traced array (a python int would
    retrace per batch)."""
    from ..models.jasper import ConvBn
    ema = 1.0 - ConvBn.batch_norm_momentum  # flax momentum of every model BN
    adapt_model = model.clone(dropout=0, spec_augment=None)

    def adapt_step(params, reset_stats, avg_stats, n, batch):
        _, mutated = adapt_model.apply(
            {'params': params, 'batch_stats': reset_stats},
            undo_int16_transport(batch['x']), xlen=batch['xlen'],
            training=True, mutable=['batch_stats'])
        batch_stats = jax.tree.map(lambda mut, r: (mut - ema * r) / (1.0 - ema),
                                   mutated['batch_stats'], reset_stats)
        return jax.tree.map(lambda a, b: a + (b - a) / n, avg_stats, batch_stats)
    return adapt_step


def init_train_state(model, optimizer, example_batch, rng) -> TrainState:
    variables = model.init(rng, example_batch['x'], xlen=example_batch['xlen'])
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=optimizer.init(params))
