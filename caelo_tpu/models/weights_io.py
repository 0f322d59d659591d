"""Weight import from the reference Keras .h5 artifacts + orbax checkpoints.

The shipped models (``TrainedModels/SphericalRingPCRespondLayer.h5``,
``TrainedModels/EncoderModel4VoxelPatch.h5``) are the authoritative numerics
for golden tests (SURVEY.md section 4).  Keras stores Conv kernels as
``(spatial..., in, out)`` and Dense as ``(in, out)`` — identical to Flax —
so the import is a pure renaming, no transposes.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

REFERENCE_MODELS_DIR = "/root/reference/TrainedModels"


def _h5_layer_weights(path: str) -> Dict[str, list]:
    """Read {layer_name: [kernel, bias]} from a Keras .h5 in layer order."""
    out = {}
    with h5py.File(path, "r") as f:
        g = f["model_weights"]
        layer_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in g.attrs["layer_names"]
        ]
        for name in layer_names:
            lg = g[name]
            wnames = [
                n.decode() if isinstance(n, bytes) else n
                for n in lg.attrs.get("weight_names", [])
            ]
            if wnames:
                out[name] = [np.array(lg[w]) for w in wnames]
    return out


def load_respond_layer_params(path: str | None = None):
    """Shipped respond-layer weights -> Flax ``RespondLayer`` params."""
    path = path or os.path.join(
        REFERENCE_MODELS_DIR, "SphericalRingPCRespondLayer.h5"
    )
    w = _h5_layer_weights(path)
    convs = [n for n in w if n.startswith("conv")]
    assert len(convs) == 2, convs
    k1, b1 = w[convs[0]]
    k2, b2 = w[convs[1]]
    return {
        "params": {
            "conv1_1": {"kernel": k1, "bias": b1},
            "conv1_1_2": {"kernel": k2, "bias": b2},
        }
    }


def load_patch_encoder_params(path: str | None = None):
    """Shipped voxel-patch encoder weights -> Flax ``PatchEncoder`` params."""
    path = path or os.path.join(
        REFERENCE_MODELS_DIR, "EncoderModel4VoxelPatch.h5"
    )
    w = _h5_layer_weights(path)
    convs = sorted([n for n in w if n.startswith("conv3d")])
    denses = sorted([n for n in w if n.startswith("dense")])
    assert len(convs) == 3 and len(denses) == 2, (convs, denses)
    params = {}
    for flax_name, h5_name in zip(["conv1", "conv2", "conv3"], convs):
        k, b = w[h5_name]
        params[flax_name] = {"kernel": k, "bias": b}
    for flax_name, h5_name in zip(["fn1", "fn2"], denses):
        k, b = w[h5_name]
        params[flax_name] = {"kernel": k, "bias": b}
    return {"params": params}


def load_spherical_ae_params(path: str | None = None):
    """Shipped full 2D auto-encoder (``TrainedModels/AE4SphericalRingPC.h5``:
    6 convs, relu x5 + linear out) -> Flax ``SphericalRingAE`` params."""
    path = path or os.path.join(REFERENCE_MODELS_DIR, "AE4SphericalRingPC.h5")
    w = _h5_layer_weights(path)
    convs = sorted(
        [n for n in w if n.startswith("conv2d")],
        key=lambda n: int(n.split("_")[-1]),
    )
    assert len(convs) == 6, convs
    flax_names = [
        ("respond", "conv1_1"), ("respond", "conv1_1_2"),
        ("conv1_2",), ("conv2_2",), ("conv2_3",), ("out",),
    ]
    params: dict = {}
    for names, h5n in zip(flax_names, convs):
        k, b = w[h5n]
        node = params
        for part in names[:-1]:
            node = node.setdefault(part, {})
        node[names[-1]] = {"kernel": k, "bias": b}
    return {"params": params}


def load_voxel_ae_params(path: str | None = None):
    """Shipped full 3D auto-encoder
    (``TrainedModels/AutoencoderModel4VoxelPatch.h5``: relu convs/denses,
    linear 20-dim code, sigmoid out — matching the training script, unlike
    the tanh encoder-only artifact) -> Flax ``VoxelPatchAE`` params.

    Use with ``VoxelPatchAE(activation='relu', code_activation='linear')``.
    """
    path = path or os.path.join(
        REFERENCE_MODELS_DIR, "AutoencoderModel4VoxelPatch.h5"
    )
    w = _h5_layer_weights(path)
    convs = sorted(
        [n for n in w if n.startswith("conv3d")],
        key=lambda n: int(n.split("_")[-1]),
    )
    denses = sorted(
        [n for n in w if n.startswith("dense")],
        key=lambda n: int(n.split("_")[-1]),
    )
    assert len(convs) == 6 and len(denses) == 4, (convs, denses)
    enc = {}
    for fx, h5n in zip(["conv1", "conv2", "conv3"], convs[:3]):
        k, b = w[h5n]
        enc[fx] = {"kernel": k, "bias": b}
    for fx, h5n in zip(["fn1", "fn2"], denses[:2]):
        k, b = w[h5n]
        enc[fx] = {"kernel": k, "bias": b}
    params = {"encoder": enc}
    for fx, h5n in zip(["fn3", "fn4"], denses[2:]):
        k, b = w[h5n]
        params[fx] = {"kernel": k, "bias": b}
    for fx, h5n in zip(["conv2_1", "conv2_2", "out"], convs[3:]):
        k, b = w[h5n]
        params[fx] = {"kernel": k, "bias": b}
    return {"params": params}


def respond_params_from_ae(ae_params):
    """Extract ``RespondLayer`` inference params from trained
    ``SphericalRingAE`` params (the 'respond' submodule — the reference's
    RespondLayer submodel split, ``AE4SphericalRingPC.py:145``)."""
    return {"params": ae_params["params"]["respond"]}


def encoder_params_from_ae(ae_params):
    """Extract ``PatchEncoder`` inference params from trained
    ``VoxelPatchAE`` params (the 'encoder' submodule — the reference's
    encoder submodel split, ``AE4VoxelPatch.py:210``).  Run inference with
    ``PipelineConfig(encoder_activation='relu',
    encoder_code_activation='linear')`` to match the training recipe."""
    return {"params": ae_params["params"]["encoder"]}


def reference_models_available() -> bool:
    return h5py is not None and os.path.isdir(REFERENCE_MODELS_DIR)


def save_checkpoint(path: str, params, step: int = 0):
    """Save params with orbax (replaces Keras ``.h5`` saves,
    ``AE4SphericalRingPC.py:169-170``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, str(step)), params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, step: int = 0):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), str(step)))
