"""CLIP text + vision encoders (flax) and a BPE tokenizer.

Replaces the transformers models the reference loads:
  - CLIPTextModel of SD2 (OpenCLIP ViT-H text tower: hidden 1024, 23 layers,
    16 heads, GELU) — stable_diffusion_depth.py:61-63
  - CLIPVisionModelWithProjection of Zero123++ (vision_encoder,
    trainer.py:626: image_embeds ramped into the prompt embedding)

Tokenizer: loads a CLIP vocab.json/merges.txt pair from a local path when
available (e.g. an HF snapshot passed via weights config); in the zero-egress
test environment it falls back to a deterministic hash tokenizer with the same
id range and special-token layout, so every downstream shape/flow is exercised.
"""

from __future__ import annotations

import html
import json
import os
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.ops.attention import attention


class CLIPTextConfig:
    def __init__(self, vocab_size=49408, hidden_size=1024, num_layers=23,
                 num_heads=16, intermediate_size=4096, max_positions=77,
                 act="gelu"):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.max_positions = max_positions
        self.act = act

    @staticmethod
    def sd2():
        return CLIPTextConfig()

    @staticmethod
    def tiny():
        return CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                              num_heads=2, intermediate_size=64)


class CLIPVisionConfig:
    def __init__(self, hidden_size=1280, num_layers=32, num_heads=16,
                 intermediate_size=5120, image_size=224, patch_size=14,
                 projection_dim=1024, act="gelu"):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.projection_dim = projection_dim
        self.act = act

    @staticmethod
    def vit_h():
        """OpenCLIP ViT-H/14 (Zero123++ vision encoder, image_embeds dim 1024)."""
        return CLIPVisionConfig()

    @staticmethod
    def tiny():
        return CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=32,
                                patch_size=8, projection_dim=32)


def _act(name):
    if name == "gelu":
        # transformers ACT2FN["gelu"] is the EXACT erf GELU
        # (tests/test_weights_numeric.py)
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise NotImplementedError(name)


class _CLIPLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    act: str
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(self.dtype)
        B, S, C = h.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(h)

        def split(t):
            return t.reshape(B, S, self.heads, hd).transpose(0, 2, 1, 3)

        if self.causal:
            scale = 1.0 / np.sqrt(hd)
            logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                                preferred_element_type=jnp.float32) * scale
            mask = jnp.tril(jnp.ones((S, S), bool))
            logits = jnp.where(mask[None, None], logits, -1e30)
            probs = nn.softmax(logits, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        else:
            o = attention(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, self.hidden)
        x = x + nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(h)
        h = _act(self.act)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, S) token ids -> (B, S, hidden) final hidden states."""
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size))
        x = tok + pos[None, :input_ids.shape[1]].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = _CLIPLayer(cfg.hidden_size, cfg.num_heads,
                           cfg.intermediate_size, cfg.act, causal=True,
                           dtype=self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="final_layer_norm")(x)


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) normalized pixels -> image_embeds (B, projection_dim)."""
        cfg = self.config
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(x)
        B, gh, gw, C = patches.shape
        patches = patches.reshape(B, gh * gw, C)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (B, 1, C))
        h = jnp.concatenate([cls, patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (gh * gw + 1, cfg.hidden_size))
        h = h + pos[None].astype(self.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="pre_layrnorm")(h).astype(self.dtype)
        for i in range(cfg.num_layers):
            h = _CLIPLayer(cfg.hidden_size, cfg.num_heads,
                           cfg.intermediate_size, cfg.act, causal=False,
                           dtype=self.dtype, name=f"layers_{i}")(h)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="post_layernorm")(h[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled.astype(self.dtype))


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

class CLIPTokenizer:
    """CLIP BPE tokenizer with local-vocab loading + hash fallback.

    API mirrors the slice of transformers.CLIPTokenizer the reference uses
    (stable_diffusion_depth.py:224-237): __call__ with max_length padding ->
    input_ids."""

    def __init__(self, vocab_path: Optional[str] = None,
                 merges_path: Optional[str] = None,
                 vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = max_length
        self.bos_token_id = vocab_size - 2
        self.eos_token_id = vocab_size - 1
        # textual-inversion concept tokens (transformers add_tokens
        # equivalent; reference load_concept adds the trained token and
        # resizes the embedding, stable_diffusion_depth.py:196-213)
        self.added_tokens: dict = {}
        self._bpe = None
        if vocab_path and os.path.exists(vocab_path):
            self._load_bpe(vocab_path, merges_path)

    def add_token(self, token: str, token_id: int) -> None:
        """Map a literal whitespace-delimited token to a fixed id (used by
        textual-inversion concepts whose embeddings extend the table)."""
        self.added_tokens[token.lower()] = token_id

    def _load_bpe(self, vocab_path, merges_path):
        with open(vocab_path) as f:
            self.encoder = json.load(f)
        merges = open(merges_path).read().split("\n")[1:]
        merges = [tuple(m.split()) for m in merges if m and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self._bpe = True
        self.cache = {}

    def _bpe_word(self, token: str) -> List[str]:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new.append(first + second)
                    i += 2
                else:
                    new.append(word[i])
                    i += 1
            word = tuple(new)
        return list(word)

    def encode(self, text: str) -> List[int]:
        import re

        text = html.unescape(text.strip().lower())
        # isolate added (textual-inversion) tokens before whitespace
        # splitting, so "<sks>." / "<sks>," still hit the concept id the
        # way transformers' added-token matcher does (longest token first
        # in case one added token prefixes another)
        for tok in sorted(self.added_tokens, key=len, reverse=True):
            if tok in text:
                text = text.replace(tok, f" {tok} ")
        ids: List[int] = []
        for chunk in text.split():
            if chunk in self.added_tokens:
                ids.append(self.added_tokens[chunk])
                continue
            words = re.findall(r"[\w]+|[^\s\w]", chunk)
            if self._bpe:
                for w in words:
                    for piece in self._bpe_word(w):
                        ids.append(self.encoder.get(
                            piece, self.encoder.get("<|endoftext|>", 0)))
            else:
                # deterministic hash fallback (zero-egress environments)
                import hashlib

                for w in words:
                    h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                    ids.append(h % (self.vocab_size - 3) + 1)
        return ids

    def __call__(self, prompts, padding: str = "max_length",
                 max_length: Optional[int] = None, truncation: bool = True):
        if isinstance(prompts, str):
            prompts = [prompts]
        max_length = max_length or self.model_max_length
        out = np.full((len(prompts), max_length), self.eos_token_id, np.int32)
        for i, p in enumerate(prompts):
            ids = [self.bos_token_id] + self.encode(p)[: max_length - 2] + \
                [self.eos_token_id]
            out[i, : len(ids)] = ids
        return out
