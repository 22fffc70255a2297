"""Import shims so the ACTUAL reference PyTorch code at /root/reference can
run inside this (torch-cpu, no-timm, transformers-4.57) container.

VERDICT.md round-1 item 4: all round-1 parity tests compared against
hand-written oracles; the acceptance bar (BASELINE.json) is bit-exact token
IDs vs the *reference implementation*. These shims make the reference's
``models/seed_qformer`` package importable:

- a minimal ``timm`` stub (the reference only touches ``drop_path``,
  ``to_2tuple``, ``trunc_normal_``, ``DropPath``, ``PatchEmbed``, ``_cfg``,
  ``register_model``, ``named_apply``, ``adapt_input_conv``, ``timm.models.hub``)
- re-exports of ``apply_chunking_to_forward`` & co. that transformers moved
  from ``modeling_utils`` to ``pytorch_utils`` after the reference snapshot

The reference tree is treated as UNTRUSTED third-party code: we import and
execute its model math for parity testing only.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REFERENCE_MODELS = "/root/reference/models"


def _install_timm_stub() -> None:
    if "timm" in sys.modules:
        return

    def drop_path(x, drop_prob: float = 0.0, training: bool = False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1.0 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * rand.floor_()

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
        return t

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return drop_path(x, self.drop_prob or 0.0, self.training)

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, **kw):
            super().__init__()
            img_size, patch_size = to_2tuple(img_size), to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.num_patches = ((img_size[0] // patch_size[0])
                                * (img_size[1] // patch_size[1]))
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size, stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    def _cfg(url="", **kwargs):
        return {"url": url, **kwargs}

    def register_model(fn):
        return fn

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        return module

    def adapt_input_conv(in_chans, conv_weight):
        return conv_weight

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    vt = types.ModuleType("timm.models.vision_transformer")
    registry = types.ModuleType("timm.models.registry")
    helpers = types.ModuleType("timm.models.helpers")
    hub = types.ModuleType("timm.models.hub")

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    vt._cfg = _cfg
    vt.PatchEmbed = PatchEmbed
    registry.register_model = register_model
    helpers.named_apply = named_apply
    helpers.adapt_input_conv = adapt_input_conv
    hub.download_cached_file = None   # never called in tests (offline)

    timm.models = models
    models.layers = layers
    models.vision_transformer = vt
    models.registry = registry
    models.helpers = helpers
    models.hub = hub
    import importlib.machinery
    for name, mod in [("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers),
                      ("timm.models.vision_transformer", vt),
                      ("timm.models.registry", registry),
                      ("timm.models.helpers", helpers),
                      ("timm.models.hub", hub)]:
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # _is_package_available probe) doesn't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def _patch_transformers() -> None:
    """transformers >= 4.35 moved these to pytorch_utils; the reference
    imports them from modeling_utils (qformer_causual.py:38-43)."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for sym in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                "prune_linear_layer"):
        if not hasattr(mu, sym):
            setattr(mu, sym, getattr(pu, sym))


def load_reference_seed_qformer():
    """Import the reference seed_qformer package (namespace package under
    /root/reference/models). Returns a namespace with the modules."""
    _install_timm_stub()
    _patch_transformers()
    if REFERENCE_MODELS not in sys.path:
        sys.path.insert(0, REFERENCE_MODELS)
    import seed_qformer.eva_vit as eva_vit            # noqa
    import seed_qformer.qformer_causual as qformer_causual  # noqa
    import seed_qformer.qformer_quantizer as qformer_quantizer  # noqa
    import seed_qformer.vit as vit                    # noqa
    return types.SimpleNamespace(
        eva_vit=eva_vit, qformer_causual=qformer_causual,
        qformer_quantizer=qformer_quantizer, vit=vit)
