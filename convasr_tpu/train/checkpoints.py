"""Checkpoint save/resume (orbax) + reference .pt converter.

Behavior spec: reference checkpoints are torch.save dicts with
model_state_dict / optimizer_state_dict / amp_state_dict / sampler_state_dict
/ epoch / iteration / args (train.py:324-341); filename template
`checkpoint_epoch{epoch:02d}_iter{iteration:07d}.pt` (train.py:918);
multi-checkpoint weight averaging (train.py:347-353); old-checkpoint GC
(tools.py:253-279).

Here checkpoints are orbax-saved pytrees {params, batch_stats, opt_state,
step, epoch, sampler: {batch_idx}, args}; `load_reference_checkpoint`
converts a reference .pt state_dict into Flax params/batch_stats so users can
migrate trained models.
"""
import glob
import json
import os
import re
import typing

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:
    ocp = None

CHECKPOINT_TEMPLATE = 'checkpoint_epoch{epoch:02d}_iter{iteration:07d}'


def checkpoint_path(experiment_dir: str, epoch: int, iteration: int,
                    template: str = None) -> str:
    """template: --checkpoint-format override (spec: train.py:918,326)."""
    return os.path.join(experiment_dir, (template or CHECKPOINT_TEMPLATE).format(
        epoch=epoch, iteration=iteration))


def save_checkpoint(path: str, state, epoch: int = 0, sampler_state: dict = None,
                    args: dict = None):
    """state: TrainState (or dict with params/batch_stats/opt_state/step)."""
    assert ocp is not None, 'orbax-checkpoint is required for checkpointing'
    payload = dict(
        params=state.params, batch_stats=state.batch_stats,
        opt_state=state.opt_state, step=state.step)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.abspath(path), payload, force=True)
    checkpointer.wait_until_finished()
    if jax.process_index() == 0:  # multi-process: primary writes meta
        meta = dict(epoch=epoch, iteration=int(jax.device_get(state.step)),
                    sampler=sampler_state or {}, args=args or {})
        with open(os.path.join(path, 'meta.json'), 'w') as f:
            json.dump(meta, f, ensure_ascii=False, indent=2, default=str)
    return path


def restore_checkpoint(path: str, abstract_payload=None):
    assert ocp is not None, 'orbax-checkpoint is required for checkpointing'
    checkpointer = ocp.StandardCheckpointer()
    payload = checkpointer.restore(os.path.abspath(path), abstract_payload) \
        if abstract_payload is not None else checkpointer.restore(os.path.abspath(path))
    meta_path = os.path.join(path, 'meta.json')
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def average_checkpoints(paths: typing.List[str]):
    """Uniform weight averaging across checkpoints (spec: train.py:347-353)."""
    payloads = [restore_checkpoint(p)[0] for p in paths]
    n = float(len(payloads))
    avg_params = jax.tree.map(lambda *xs: sum(x.astype(np.float64) for x in xs) / n
                              if np.issubdtype(np.asarray(xs[0]).dtype, np.floating)
                              else xs[0], *[p['params'] for p in payloads])
    avg_params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32)
                              if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
                              avg_params)
    out = dict(payloads[0])
    out['params'] = avg_params
    return out


def remove_old_checkpoints(experiment_dir: str, keep_last: int = 5,
                           keep_iterations: typing.Sequence[int] = ()):
    """GC old checkpoints (spec: tools.py rmoldcheckpoints, tools.py:253-279)."""
    pattern = re.compile(r'checkpoint_epoch(\d+)_iter(\d+)$')
    found = []
    for path in glob.glob(os.path.join(experiment_dir, 'checkpoint_epoch*_iter*')):
        m = pattern.search(path)
        if m:
            found.append((int(m.group(2)), path))
    found.sort()
    removed = []
    for iteration, path in found[:-keep_last] if keep_last else found:
        if iteration in keep_iterations:
            continue
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


# --- reference torch checkpoint conversion -------------------------------

def load_reference_checkpoint(pt_path: str):
    """Load a reference convasr .pt checkpoint and convert model_state_dict
    to Flax {params, batch_stats} for the matching zoo config.

    Key mapping (reference module names, models.py:158-280):
      backbone.{i}.conv.{r}.0.weight        -> block{i}/conv{r}/conv/kernel
      backbone.{i}.conv.{r}.{0,2}.*         -> depthwise/pointwise (separable)
      backbone.{i}.bn.{r}.{weight,bias,running_mean,running_var}
                                            -> block{i}/bn{r}/...
      backbone.{i}.conv_residual.{j}.*      -> block{i}/conv_residual{j}/...
      backbone.{i}.bn_residual.{j}.*        -> block{i}/bn_residual{j}/...
      decoder.0.{weight,bias}               -> decoder/head0/...
    Conv weights transpose (out, in, k) -> (k, in, out).
    """
    import torch
    ckpt = torch.load(pt_path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model_state_dict', ckpt)
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def conv_kernel(w):
        return np.asarray(w).transpose(2, 1, 0)

    # first pass: which (block, conv) stacks are separable? (the reference's
    # separable ConvSamePadding is Sequential(depthwise, relu, pointwise) so a
    # `.2.` sub-module exists; plain convs only have `.0.`)
    separable_convs = set()
    for name in sd:
        parts = name.split('.')
        if len(parts) >= 5 and parts[0] == 'backbone' and parts[2] == 'conv' and parts[4] == '2':
            separable_convs.add((parts[1], parts[3]))

    for name, tensor in sd.items():
        t = tensor.numpy() if hasattr(tensor, 'numpy') else np.asarray(tensor)
        parts = name.split('.')
        if parts[0] == 'backbone':
            i, kind = parts[1], parts[2]
            block = f'block{i}'
            if kind == 'conv':
                r, sub = parts[3], parts[4]
                conv_name = f'conv{r}'
                sep = (i, r) in separable_convs
                if sub == '0':
                    target = 'depthwise' if sep else 'conv'
                    leaf = 'kernel' if parts[-1] == 'weight' else 'bias'
                    put(params, [block, conv_name, target, leaf],
                        conv_kernel(t) if leaf == 'kernel' else t)
                elif sub == '2':
                    leaf = 'kernel' if parts[-1] == 'weight' else 'bias'
                    put(params, [block, conv_name, 'pointwise', leaf],
                        conv_kernel(t) if leaf == 'kernel' else t)
            elif kind in ('bn', 'bn_residual'):
                j = parts[3]
                bn_name = f'bn{j}' if kind == 'bn' else f'bn_residual{j}'
                leaf = parts[-1]
                if leaf == 'weight':
                    put(params, [block, bn_name, 'scale'], t)
                elif leaf == 'bias':
                    put(params, [block, bn_name, 'bias'], t)
                elif leaf == 'running_mean':
                    put(batch_stats, [block, bn_name, 'mean'], t)
                elif leaf == 'running_var':
                    put(batch_stats, [block, bn_name, 'var'], t)
            elif kind == 'conv_residual':
                j = parts[3]
                if parts[-1] == 'weight':
                    put(params, [block, f'conv_residual{j}', 'kernel'], conv_kernel(t))
                else:
                    put(params, [block, f'conv_residual{j}', 'bias'], t)
        elif parts[0] == 'decoder':
            if len(parts) == 3:
                # flat Conv1d head: decoder.{i}.{weight,bias} -> decoder/head{i}
                head = f'head{parts[1]}'
                if parts[-1] == 'weight':
                    put(params, ['decoder', head, 'kernel'], conv_kernel(t))
                else:
                    put(params, ['decoder', head, 'bias'], t)
            elif parts[1] == '1' and len(parts) >= 6 and parts[3] in ('conv', 'bn'):
                # type='bpe' head: decoder.1 is Sequential(ConvBn1d, ConvBn1d)
                # (reference models.py:27-35) -> decoder/bpe_conv{j}/{conv0,bn0}
                j, kind = parts[2], parts[3]
                bpe = f'bpe_conv{j}'
                leaf = parts[-1]
                if kind == 'conv':
                    # decoder.1.{j}.conv.0.0.weight (ConvSamePadding Sequential)
                    if leaf == 'weight':
                        put(params, ['decoder', bpe, 'conv0', 'conv', 'kernel'],
                            conv_kernel(t))
                    elif leaf == 'bias':
                        put(params, ['decoder', bpe, 'conv0', 'conv', 'bias'], t)
                else:  # bn: decoder.1.{j}.bn.0.{weight,bias,running_mean,running_var}
                    if leaf == 'weight':
                        put(params, ['decoder', bpe, 'bn0', 'scale'], t)
                    elif leaf == 'bias':
                        put(params, ['decoder', bpe, 'bn0', 'bias'], t)
                    elif leaf == 'running_mean':
                        put(batch_stats, ['decoder', bpe, 'bn0', 'mean'], t)
                    elif leaf == 'running_var':
                        put(batch_stats, ['decoder', bpe, 'bn0', 'var'], t)
                    # num_batches_tracked: no Flax equivalent, dropped
            elif parts[-1] != 'num_batches_tracked':
                raise ValueError(
                    f'unsupported reference decoder structure: {name!r} — '
                    'expected a flat Conv1d head (decoder.{i}.weight) or the '
                    "type='bpe' nested ConvBn head (decoder.1.{j}.conv/bn.*)")
        # frontend buffers (window/mel/stft) are reconstructed from config

    meta = {k: ckpt[k] for k in ('epoch', 'iteration', 'args', 'sampler_state_dict')
            if isinstance(ckpt, dict) and k in ckpt}
    return dict(params=params, batch_stats=batch_stats), meta
