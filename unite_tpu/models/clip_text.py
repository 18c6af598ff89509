"""CLIP text tower + zero-shot classifier plumbing for stage 3.

The reference leans on the ``openai_clip`` pip package for the stage-3
zero-shot teacher (/root/reference/src/utils.py:44-82: prompt
``"a video of a person {c}"`` per class, encode_text, then per-frame
encode_image similarities in clip_infer :55-68). This module provides the
first-party equivalents:

* ``CLIPTextTransformer`` — flax text encoder (token embedding, causal
  transformer, ln_final, eot-token pooling, text projection), importable
  from OpenAI text-tower weights via ``text_state_to_flax_params``;
* ``SimpleTokenizer`` — byte-pair tokenizer compatible with CLIP's
  ``bpe_simple_vocab_16e6`` merges file (user-supplied path: the merges
  list is an external artifact like the model weights);
* ``build_zero_shot_fn`` — wires prompts + text features + the vision
  tower's ``cls_features`` mode into a ``videos → [B, C] similarities``
  callable. Precomputed text features (.npy) are accepted so the tokenizer
  is optional.

Class-name tables for the 8/12/23-class benchmarks mirror utils.py:71-82.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.models.clip import CLIPBlock, LayerNorm, quick_gelu

CLASS_NAMES = {
    8: ["drink", "jump", "pick", "pour", "push", "run", "walk", "wave"],
    12: ["climb", "fencing", "golf", "soccer", "pullup", "boxing", "pushup",
         "riding bike", "horse riding", "basketball", "archery", "walking"],
    23: ["archery", "baseball", "basketball", "biking", "bowling", "swimming",
         "diving", "fencing", "field hockey", "gymnastics", "golf",
         "horse riding", "kayaking", "rock climbing", "climbing rope",
         "skateboarding", "skiing", "sumo wrestling", "surfing", "tai chi",
         "tennis", "trampoline jumping", "volleyball"],
}

PROMPT = "a video of a person {}"


def get_class_names(nb_classes: int) -> List[str]:
    if nb_classes not in CLASS_NAMES:
        raise NotImplementedError(f"no class-name table for {nb_classes} classes")
    return CLASS_NAMES[nb_classes]


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------


class CLIPTextTransformer(nn.Module):
    """OpenAI CLIP text encoder (ViT-B/16 text tower geometry by default)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512  # output projection dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: int32 [B, context_length] → L2-unnormalized features
        [B, embed_dim] (caller normalizes, as the reference does)."""
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width), jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb.astype(self.dtype)

        # causal attention mask via big-negative additive bias
        n = self.context_length
        causal = jnp.tril(jnp.ones((n, n), bool))
        for i in range(self.layers):
            x = CLIPTextBlock(
                num_heads=self.heads, dtype=self.dtype, name=f"resblocks_{i}",
            )(x, causal)
        x = LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # eot token = highest token id in each sequence (OpenAI convention)
        eot = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim), jnp.float32,
        )
        return jnp.einsum("bc,cd->bd", feats, proj.astype(feats.dtype),
                          preferred_element_type=jnp.float32)


class CLIPTextBlock(nn.Module):
    """Residual attention block with a causal mask (text tower)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        h = LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="attn_in_proj")(h)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (head_dim**-0.5)
        scores = jnp.where(causal_mask[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="attn_out_proj")(out)
        x = x + out
        h = LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_c_proj")(h)
        return x + h


def text_state_to_flax_params(state: dict) -> dict:
    """OpenAI CLIP full-model state_dict → text-tower flax params."""
    import re

    from unite_tpu.utils.torch_import import _np, unflatten

    entries = {}
    for k, v in state.items():
        if k in ("positional_embedding", "text_projection"):
            entries[(k,)] = _np(v)
        elif k == "token_embedding.weight":
            entries[("token_embedding",)] = _np(v)
        elif k.startswith("ln_final."):
            leaf = "scale" if k.endswith("weight") else "bias"
            entries[("ln_final", leaf)] = _np(v)
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", k)
            if not m:
                continue
            idx, rest = m.group(1), m.group(2)
            base = (f"resblocks_{idx}",)
            v = _np(state[k])
            if rest == "attn.in_proj_weight":
                entries[base + ("attn_in_proj", "kernel")] = v.T
            elif rest == "attn.in_proj_bias":
                entries[base + ("attn_in_proj", "bias")] = v
            elif rest == "attn.out_proj.weight":
                entries[base + ("attn_out_proj", "kernel")] = v.T
            elif rest == "attn.out_proj.bias":
                entries[base + ("attn_out_proj", "bias")] = v
            elif rest in ("ln_1.weight", "ln_2.weight"):
                entries[base + (rest.split(".")[0], "scale")] = v
            elif rest in ("ln_1.bias", "ln_2.bias"):
                entries[base + (rest.split(".")[0], "bias")] = v
            elif rest.startswith("mlp.c_fc"):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                entries[base + ("mlp_c_fc", leaf)] = v.T if leaf == "kernel" else v
            elif rest.startswith("mlp.c_proj"):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                entries[base + ("mlp_c_proj", leaf)] = v.T if leaf == "kernel" else v
    return unflatten(entries)


# ---------------------------------------------------------------------------
# BPE tokenizer (CLIP-compatible; merges file supplied by the user)
# ---------------------------------------------------------------------------


@lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class SimpleTokenizer:
    """CLIP's lowercase BPE tokenizer (merges file = external artifact)."""

    def __init__(self, bpe_path: str):
        import regex as re_mod

        self.re = re_mod
        self.byte_encoder = bytes_to_unicode()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = self.re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            self.re.IGNORECASE,
        )

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        text = self.re.sub(r"\s+", " ", text)
        ids = []
        for token in self.re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def tokenize(self, texts: Sequence[str], context_length: int = 77
                 ) -> np.ndarray:
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [sot] + self.encode(text) + [eot]
            if len(ids) > context_length:
                ids = ids[: context_length - 1] + [eot]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Zero-shot wiring
# ---------------------------------------------------------------------------


def compute_text_features(args) -> Optional[np.ndarray]:
    """Resolve [C, D] text features: precomputed .npy, or tokenizer + text
    tower weights. Returns None when neither artifact is available."""
    feats_path = getattr(args, "clip_text_features", "") or ""
    if feats_path and os.path.exists(feats_path):
        return np.load(feats_path).astype(np.float32)
    text_init = getattr(args, "clip_text_init", "") or ""
    bpe_path = getattr(args, "clip_bpe_path", "") or ""
    if not (text_init and os.path.exists(text_init)
            and bpe_path and os.path.exists(bpe_path)):
        return None
    from unite_tpu.utils.torch_import import load_torch_state, merge_params

    tokenizer = SimpleTokenizer(bpe_path)
    names = get_class_names(args.nb_classes)
    tokens = tokenizer.tokenize([PROMPT.format(c) for c in names])
    model = CLIPTextTransformer()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens[:1]))["params"]
    loaded = text_state_to_flax_params(load_torch_state(text_init, "state_dict|model"))
    # strict: a geometry mismatch (e.g. an L/14 checkpoint, text width 768,
    # against this B/16 tower) must raise, not skip-and-continue — silently
    # random-init text features would hand stage 3 a meaningless zero-shot
    # teacher, defeating run_stage3's deliberate hard-error on missing
    # artifacts
    params, missing, _ = merge_params(params, loaded, strict_shapes=True)
    if missing:
        raise ValueError(
            f"--clip_text_init {text_init}: {len(missing)} text-tower "
            f"params absent from the checkpoint "
            f"(e.g. {['.'.join(k) for k in missing[:3]]}); not a full CLIP "
            f"state_dict?")
    feats = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
    return feats.astype(np.float32)


def build_zero_shot_fn(args, teacher, teacher_params):
    """videos [B,T,H,W,C] → softmaxed similarities [B, nb_classes]
    (utils.py clip_infer semantics), or None when no text artifacts exist."""
    text_features = compute_text_features(args)
    if text_features is None:
        print("zero-shot teacher: no text features available "
              "(pass --clip_text_features or --clip_text_init + "
              "--clip_bpe_path); falling back to uniform similarities")
        return None
    tf = text_features / np.linalg.norm(text_features, axis=-1, keepdims=True)
    tf = jnp.asarray(tf)

    # teacher params enter as a jit ARGUMENT, not a closure capture: a
    # captured tree is baked into the program as constants — at clip_b16
    # scale that embeds ~350MB of weights in the serialized HLO (the
    # tunneled compile service rejects the request with HTTP 413, and any
    # backend pays the duplicate weight storage in the executable)
    res = getattr(args, "clip_input_resolution", None)

    @jax.jit
    def zero_shot(tp, videos):
        from unite_tpu.engines.pretrain_umt import resize_for_teacher
        from unite_tpu.ops.normalize import normalize_videos

        x = normalize_videos(videos)
        if res:
            # same torch-parity resize the train step applies before its
            # teacher forward — without it any clip_input_resolution !=
            # input_size (the L/14-at-196 recipe) trips the teacher's
            # raster check on the first target batch
            x = resize_for_teacher(x, int(res))
        feats = teacher.apply({"params": tp}, x, None, True)
        b = videos.shape[0]
        feats = feats.reshape(b, -1, feats.shape[-1])  # [B, T, D]
        logits = 100.0 * jnp.einsum("btd,cd->btc", feats.astype(jnp.float32), tf)
        return jax.nn.softmax(logits, axis=-1).mean(axis=1)

    def call(videos, tp=teacher_params):
        return zero_shot(tp, videos)

    return call
