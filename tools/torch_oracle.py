"""Torch-oracle bridge: run the reference PyTorch network on CPU and
transplant its weights into the Flax model for numerical parity tests.

The reference's CUDA-free configuration (``no_feature_mdconv=True`` +
``num_deform_blocks=0`` + ``stereodrnet`` refinement — only
``nets/deform_conv/deform_conv.py:44-45`` is CUDA-only) runs fine on CPU,
so full-model outputs can be compared directly.

Alignment strategy: both frameworks execute the SAME forward graph, so the
sequence of parameterised leaf layers in *execution order* is identical.
We record that order on both sides — forward hooks on the torch side, a
scoped ``Module.param``/``Module.variable`` recorder on the flax side —
dedupe re-executions (shared feature extractor), convert layouts
(``OIHW -> HWIO``, BN weight/bias/running_mean/running_var ->
scale/bias/mean/var, ConvTranspose kernels spatially flipped + in/out
swapped for the input-dilated-conv formulation in
``aanet_tpu/models/layers.py``), and verify every shape as we assign.
Any structural drift fails loudly before the numeric comparison runs.
"""
from __future__ import annotations

import copy
import sys
import types
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

REFERENCE_ROOT = "/root/reference"


def load_reference_nets(ref_root: str = REFERENCE_ROOT):
    """Import the reference ``nets`` package with the CUDA .so stubbed.

    ``nets/deform_conv/deform_conv.py`` does ``from . import
    deform_conv_cuda`` at import time; the CUDA-free configs never call
    into it, so an empty module satisfies the import.
    """
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    stub_name = "nets.deform_conv.deform_conv_cuda"
    if stub_name not in sys.modules:
        sys.modules[stub_name] = types.ModuleType(stub_name)
    import nets  # noqa: F401  (reference package)

    return nets


# ---------------------------------------------------------------------------
# Flax side: record parameter-creation order during init
# ---------------------------------------------------------------------------


def record_flax_units(model, rng, *args, **kwargs):
    """``model.init`` while recording the creation order of parameters.

    Returns ``(variables, units)`` where each unit is one parameterised
    layer: ``{"path": (..,), "names": {leaf_name: collection}}`` in
    first-creation order (re-entries from weight sharing are deduped).
    """
    import flax.linen as nn

    order: List[Tuple[tuple, str, str]] = []
    orig_param = nn.Module.param
    orig_variable = nn.Module.variable

    def rec_param(self, name, *a, **k):
        order.append((tuple(self.scope.path), name, "params"))
        return orig_param(self, name, *a, **k)

    def rec_variable(self, col, name, *a, **k):
        order.append((tuple(self.scope.path), name, col))
        return orig_variable(self, col, name, *a, **k)

    nn.Module.param = rec_param
    nn.Module.variable = rec_variable
    try:
        variables = model.init(rng, *args, **kwargs)
    finally:
        nn.Module.param = orig_param
        nn.Module.variable = orig_variable

    units: List[Dict[str, Any]] = []
    by_path: Dict[tuple, Dict[str, Any]] = {}
    seen = set()
    for path, name, col in order:
        if (path, name) in seen:
            continue
        seen.add((path, name))
        if path not in by_path:
            u = {"path": path, "names": {}}
            by_path[path] = u
            units.append(u)
        by_path[path]["names"][name] = col
    return variables, units


# ---------------------------------------------------------------------------
# Torch side: record leaf-module execution order
# ---------------------------------------------------------------------------


def torch_execution_order(module, inputs: Sequence) -> list:
    """Run a forward pass and return parameterised leaf modules in
    first-execution order."""
    import torch

    executed: list = []
    seen = set()

    def hook(mod, inp, out):
        if id(mod) in seen:
            return
        if not mod._parameters and not mod._buffers:
            return
        seen.add(id(mod))
        executed.append(mod)

    handles = [
        m.register_forward_hook(hook)
        for m in module.modules()
        if len(list(m.children())) == 0
    ]
    try:
        with torch.no_grad():
            module(*inputs)
    finally:
        for h in handles:
            h.remove()
    return executed


def calibrate_torch_bn(module, inputs: Sequence, seed: int = 0):
    """Prepare a randomly-initialised torch module for eval-mode parity:

    * mildly randomize BN affine weights (so scale/bias transplant is
      non-trivially exercised),
    * set running statistics to the ACTUAL activation statistics via one
      cumulative-momentum training forward — otherwise the default
      (mean=0, var=1) stats drive activations into saturation, soft-argmin
      collapses to a one-hot argmax, and float differences flip ties into
      whole-disparity jumps instead of staying continuous.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)
            m.momentum = None  # one train forward == batch statistics
    module.train()
    with torch.no_grad():
        module(*inputs)
    module.eval()


def randomize_torch_stats(module, seed: int = 0):
    """Randomize BN affine weights and running statistics so the eval-mode
    normalisation path is non-trivially exercised by parity tests."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.5, 0.5, generator=g)
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


# ---------------------------------------------------------------------------
# Transplant
# ---------------------------------------------------------------------------


def _get_leaf(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_leaf(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    assert tree[path[-1]].shape == value.shape, (
        path, tree[path[-1]].shape, value.shape,
    )
    tree[path[-1]] = value.astype(np.asarray(tree[path[-1]]).dtype)


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def transplant(torch_mods: list, flax_units: list, variables) -> dict:
    """Assign torch weights onto the flax variable tree, unit by unit."""
    import torch
    from flax.core import unfreeze

    assert len(torch_mods) == len(flax_units), (
        f"layer-count mismatch: torch={len(torch_mods)} "
        f"flax={len(flax_units)}\n"
        + "\n".join(
            f"{i}: {type(t).__name__:24s} <-> "
            f"{'/'.join(f['path']) if f else '???'}"
            for i, (t, f) in enumerate(
                zip(
                    torch_mods + [None] * len(flax_units),
                    flax_units + [None] * len(torch_mods),
                )
            )
            if t is not None or f is not None
        )
    )

    out = {k: copy.deepcopy(unfreeze(v)) for k, v in variables.items()}
    bn_types = (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)

    for tm, fu in zip(torch_mods, flax_units):
        path, names = fu["path"], fu["names"]
        ctx = (type(tm).__name__, "/".join(path), sorted(names))
        if isinstance(tm, bn_types):
            assert {"scale", "bias", "mean", "var"} <= set(names), ctx
            _set_leaf(out["params"], path + ("scale",), _np(tm.weight))
            _set_leaf(out["params"], path + ("bias",), _np(tm.bias))
            _set_leaf(out["batch_stats"], path + ("mean",), _np(tm.running_mean))
            _set_leaf(out["batch_stats"], path + ("var",), _np(tm.running_var))
        elif isinstance(tm, torch.nn.ConvTranspose2d):
            assert "kernel" in names, ctx
            assert any("ConvTranspose" in p for p in path), ctx
            w = _np(tm.weight)  # [I, O/g, kh, kw]
            k = np.flip(w, (2, 3)).transpose(2, 3, 0, 1)
            _set_leaf(out["params"], path + ("kernel",), np.ascontiguousarray(k))
            if tm.bias is not None:
                _set_leaf(out["params"], path + ("bias",), _np(tm.bias))
        elif isinstance(tm, torch.nn.ConvTranspose3d):
            assert "kernel" in names, ctx
            w = _np(tm.weight)  # [I, O/g, kd, kh, kw]
            k = np.flip(w, (2, 3, 4)).transpose(2, 3, 4, 0, 1)
            _set_leaf(out["params"], path + ("kernel",), np.ascontiguousarray(k))
            if tm.bias is not None:
                _set_leaf(out["params"], path + ("bias",), _np(tm.bias))
        elif isinstance(tm, torch.nn.Conv2d):
            assert "kernel" in names, ctx
            w = _np(tm.weight)  # [O, I/g, kh, kw]
            _set_leaf(
                out["params"], path + ("kernel",),
                np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            )
            if tm.bias is not None:
                _set_leaf(out["params"], path + ("bias",), _np(tm.bias))
        elif isinstance(tm, torch.nn.Conv3d):
            assert "kernel" in names, ctx
            w = _np(tm.weight)  # [O, I/g, kd, kh, kw]
            _set_leaf(
                out["params"], path + ("kernel",),
                np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            )
            if tm.bias is not None:
                _set_leaf(out["params"], path + ("bias",), _np(tm.bias))
        else:
            raise NotImplementedError(ctx)
    return out


def transplant_from_torch(torch_module, torch_inputs, flax_model, rng,
                          flax_args, **flax_kwargs) -> dict:
    """One-call helper: record both orders and transplant."""
    torch_mods = torch_execution_order(torch_module, torch_inputs)
    variables, units = record_flax_units(flax_model, rng, *flax_args,
                                         **flax_kwargs)
    return transplant(torch_mods, units, variables)
