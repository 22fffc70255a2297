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


def build_reference_quantizer(cfg, use_qformer_image: bool = False,
                              init_seed=None):
    """Construct the live pieces of the reference Blip2QformerQuantizer
    (qformer_quantizer.py:143-286) at the dims of a seed_tpu
    ``SeedTokenizerConfig`` with checkpoint-identical attribute names, and
    its verbatim ``get_codebook_indices`` / ``get_codebook_entry``
    pipelines (:288-338).

    The real ``__init__`` downloads EVA/BERT weights, so the module tree
    is assembled directly. Used at scaled-down dims by
    tests/test_reference_parity.py and at FULL scale by
    scripts/acceptance.py (where ``seed_quantizer.pt`` is then
    load_state_dict'ed in). ``init_seed`` != None seeds a well-scaled
    random init (for weight-free parity runs)."""
    from functools import partial

    REF = load_reference_seed_qformer()
    qc, qq, rvit = REF.qformer_causual, REF.qformer_quantizer, REF.vit

    vit, qf = cfg.vit, cfg.qformer
    Q, code_dim = qf.query_len, cfg.code_dim

    visual_encoder = REF.eva_vit.VisionTransformer(
        img_size=vit.image_size, patch_size=vit.patch_size,
        embed_dim=vit.dim, depth=vit.depth, num_heads=vit.heads,
        mlp_ratio=vit.mlp_dim / vit.dim, qkv_bias=True,
        use_mean_pooling=False, norm_layer=partial(nn.LayerNorm, eps=1e-6))

    def make_qformer(query_length, encoder_width):
        c = qc.BertConfig(
            vocab_size=64, hidden_size=qf.hidden,
            num_hidden_layers=qf.layers, num_attention_heads=qf.heads,
            intermediate_size=qf.intermediate, hidden_act="gelu",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12)
        c.encoder_width = encoder_width
        c.add_cross_attention = True
        c.cross_attention_freq = 2
        c.query_length = query_length
        m = qc.BertLMHeadModel(config=c)
        # strip exactly what the quantizer strips (qformer_quantizer.py:206-211)
        m.cls = None
        m.bert.embeddings.word_embeddings = None
        m.bert.embeddings.position_embeddings = None
        for layer in m.bert.encoder.layer:
            layer.output = None
            layer.intermediate = None
        return m

    qformer = make_qformer(Q, vit.dim)

    class RefQuantizer(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = visual_encoder
            self.ln_vision = nn.LayerNorm(vit.dim)
            self.Qformer = qformer
            self.query_tokens = nn.Parameter(torch.zeros(1, Q, qf.hidden))
            self.quantize = qq.VectorQuantizer2(
                cfg.codebook_size, code_dim, beta=0.25, remap=None,
                sane_index_shape=False)
            self.encode_task_layer = nn.Sequential(
                nn.Linear(qf.hidden, qf.hidden), nn.Tanh(),
                nn.Linear(qf.hidden, code_dim))
            self.decode_task_layer = nn.Sequential(
                nn.Linear(code_dim, code_dim), nn.Tanh(),
                nn.Linear(code_dim, qf.hidden))
            self.pos_embed_image = nn.Parameter(torch.zeros(1, Q, qf.hidden))
            self.blocks_image = nn.ModuleList([
                rvit.Block(dim=qf.hidden, num_heads=cfg.decode_heads,
                           mlp_ratio=4.0, qkv_bias=True, qk_scale=None,
                           drop=0.0, attn_drop=0.0, drop_path=0.0,
                           norm_layer=partial(nn.LayerNorm, eps=1e-6))
                for _ in range(cfg.decode_depth)])
            if use_qformer_image:
                # Reverse Q-Former head (qformer_quantizer.py:257-276)
                self.Reverse_Qformer = make_qformer(1, qf.hidden)
                self.reverse_tokens = nn.Parameter(
                    torch.zeros(1, 1, qf.hidden))
                self.distill_image_proj = nn.Linear(qf.hidden,
                                                    cfg.image_embed_dim)
            else:
                self.image_down = nn.Sequential(
                    nn.Linear(qf.hidden, 256, bias=False), nn.ReLU(),
                    nn.Linear(256, 128, bias=False), nn.ReLU(),
                    nn.Linear(128, 32, bias=False))
                self.distill_image_proj = nn.Linear(Q * 32,
                                                    cfg.image_embed_dim)

        # verbatim pipeline of get_codebook_indices (:288-307)
        @torch.no_grad()
        def get_codebook_indices(self, image):
            image_embeds = self.ln_vision(self.visual_encoder(image))
            image_atts = torch.ones(image_embeds.size()[:-1],
                                    dtype=torch.long)
            query_tokens = self.query_tokens.expand(
                image_embeds.shape[0], -1, -1)
            query_output = self.Qformer.bert(
                query_embeds=query_tokens,
                encoder_hidden_states=image_embeds,
                encoder_attention_mask=image_atts,
                return_dict=True)
            query_output_down = self.encode_task_layer(
                query_output.last_hidden_state)
            quant, _, embed_ind = self.quantize(query_output_down)
            embed_ind = embed_ind.reshape(quant.shape[0], -1)
            return embed_ind, query_output_down

        # verbatim pipeline of get_codebook_entry (:309-338, both variants)
        @torch.no_grad()
        def get_codebook_entry(self, indices):
            quant = self.quantize.get_codebook_entry(indices.reshape(-1))
            quant = quant.view(indices.shape[0], Q, code_dim)
            up = self.decode_task_layer(quant)
            up = up + self.pos_embed_image.repeat(up.shape[0], 1, 1)
            for blk in self.blocks_image:
                up = blk(up)
            if use_qformer_image:
                query_atts = torch.ones(up.size()[:-1], dtype=torch.long)
                reverse_tokens = self.reverse_tokens.expand(
                    up.shape[0], -1, -1)
                out = self.Reverse_Qformer.bert(
                    query_embeds=reverse_tokens,
                    encoder_hidden_states=up,
                    encoder_attention_mask=query_atts,
                    return_dict=True).last_hidden_state
                return self.distill_image_proj(out).squeeze(1)
            down = self.image_down(up)
            down = down.reshape(down.shape[0], -1)
            return self.distill_image_proj(down)

    model = RefQuantizer().eval().float()
    if init_seed is not None:
        # random but well-scaled weights: matmul weights small, norms ~1
        gen = torch.Generator().manual_seed(init_seed)
        for name, p in model.named_parameters():
            if ("LayerNorm" in name or "norm" in name
                    or "ln_vision" in name):
                if name.endswith("weight"):
                    p.data = 1.0 + 0.05 * torch.randn(p.shape, generator=gen)
                else:
                    p.data = 0.05 * torch.randn(p.shape, generator=gen)
            else:
                p.data = 0.08 * torch.randn(p.shape, generator=gen)
    return model
