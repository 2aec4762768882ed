"""Import the torch reference (``/root/reference``) inside this image.

The reference needs several packages that are not baked in (beartype,
einops_exts, kornia, torchvision, torchmetrics, matplotlib, MedicalNet).
For *parity testing* — building the reference torch ``Unet`` with random
weights, converting its state dict, and comparing forwards — none of those
packages' functionality is exercised, so minimal shims are installed into
``sys.modules`` before the reference modules are imported.

Used by ``tests/test_model_parity.py`` (whole-model golden parity, VERDICT
round-1 item 3) and by the external-baseline harness (item 10).

This module contains no code derived from the reference; the einops_exts
shims implement that tiny package's public API from its documentation.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/repo/../reference"


def _module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # dependency probing) doesn't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    """Install sys.modules shims for the reference's missing dependencies.

    Idempotent; never overwrites a real installed package.
    """
    # ---- beartype: identity decorator + typing passthrough ---------------
    if "beartype" not in sys.modules:
        try:
            import beartype  # noqa: F401
        except ImportError:
            bt = _module("beartype")
            bt.beartype = lambda f: f
            bt_typing = _module("beartype.typing")
            import typing

            for attr in dir(typing):
                if not attr.startswith("_"):
                    setattr(bt_typing, attr, getattr(typing, attr))
            bt.typing = bt_typing

    # ---- einops_exts: thin wrappers over einops ---------------------------
    if "einops_exts" not in sys.modules:
        try:
            import einops_exts  # noqa: F401
        except ImportError:
            from einops import rearrange, repeat

            ee = _module("einops_exts")

            def rearrange_many(tensors, pattern, **kwargs):
                return tuple(rearrange(t, pattern, **kwargs) for t in tensors)

            def repeat_many(tensors, pattern, **kwargs):
                return tuple(repeat(t, pattern, **kwargs) for t in tensors)

            def check_shape(tensor, pattern, **kwargs):
                return rearrange(tensor, f"{pattern} -> {pattern}", **kwargs)

            ee.rearrange_many = rearrange_many
            ee.repeat_many = repeat_many
            ee.check_shape = check_shape

            import torch.nn as _nn

            class EinopsToAndFrom(_nn.Module):
                """Rearrange -> fn -> inverse rearrange (einops_exts.torch)."""

                def __init__(self, from_einops, to_einops, fn):
                    super().__init__()
                    self.from_einops = from_einops
                    self.to_einops = to_einops
                    self.fn = fn

                def forward(self, x, **kwargs):
                    shape = x.shape
                    names = self.from_einops.replace("(", "").replace(
                        ")", ""
                    ).split()
                    recon = dict(zip(names, shape))
                    x = rearrange(
                        x, f"{self.from_einops} -> {self.to_einops}"
                    )
                    x = self.fn(x, **kwargs)
                    return rearrange(
                        x, f"{self.to_einops} -> {self.from_einops}", **recon
                    )

            ee_torch = _module("einops_exts.torch")
            ee_torch.EinopsToAndFrom = EinopsToAndFrom
            ee.torch = ee_torch

    # ---- import-only placeholders -----------------------------------------
    for name, attrs in (
        ("kornia", ()),
        ("kornia.augmentation", ()),
        ("torchvision", ()),
        ("torchvision.transforms", ()),
        ("matplotlib", ()),
        ("matplotlib.pyplot", ()),
        ("torchmetrics", ()),
        ("torchmetrics.image", ()),
        ("torchmetrics.image.lpip", ("LearnedPerceptualImagePatchSimilarity",)),
        ("pytorch_warmup", ("UntunedLinearWarmup",)),
        ("ema_pytorch", ("EMA",)),
        ("nibabel", ("load",)),
    ):
        if name in sys.modules:
            continue
        try:
            __import__(name)
            continue
        except ImportError:
            pass
        mod = _module(name)
        for attr in attrs:
            setattr(mod, attr, type(attr, (), {"__init__": lambda self, *a, **k: None}))
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, mod)

    # ---- t5: avoid pulling the full transformers stack at import time -----
    if "t5" not in sys.modules:
        t5 = _module("t5")
        t5.DEFAULT_T5_NAME = "google/t5-v1_1-base"
        t5.get_encoded_dim = lambda name=None: 768

        def _t5_unavailable(*a, **k):
            raise RuntimeError("t5 text encoding stubbed out for parity runs")

        t5.t5_encode_text = _t5_unavailable

    # ---- percept_loss: requires external MedicalNet checkout --------------
    if "percept_loss" not in sys.modules:
        pl = _module("percept_loss")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "MedicalNet perceptual loss unavailable in this image"
                )

        pl.MedPercept = _Unavailable
        pl.MedPerceptualLoss = _Unavailable
        pl.Variables = _Unavailable


def load_reference_module(name: str, root: str = "/root/reference"):
    """Install stubs, put the reference on sys.path, import ``name``."""
    import os

    if not os.path.isdir(root):
        raise FileNotFoundError(root)
    install_reference_stubs()
    if root not in sys.path:
        sys.path.insert(0, root)
    return __import__(name)
