#!/usr/bin/env python
"""Extract CLIP tower weights from an OpenAI CLIP checkpoint.

Counterpart of /root/reference/src/models/extract_clip/extract.ipynb: the
reference strips the ``visual.`` prefix from the full OpenAI state dict to
produce ``vit_b16.pth`` etc. consumed by the teacher loader (clip.py:11-17).
This tool does that, plus (new) extracts the text tower and can precompute
the stage-3 zero-shot text features for a class count so training hosts
never need the tokenizer.

Usage:
  python tools/extract_clip.py ViT-B-16.pt out_dir \
      [--text] [--features-for 12 --bpe bpe_simple_vocab_16e6.txt.gz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="OpenAI CLIP .pt/.pth (full model)")
    ap.add_argument("out_dir")
    ap.add_argument("--visual-name", default="vit_b16.pth")
    ap.add_argument("--text", action="store_true",
                    help="also write the text tower (text_<visual-name>)")
    ap.add_argument("--features-for", type=int, default=0,
                    help="precompute zero-shot text features for this class "
                         "count (8/12/23) into text_features_<n>.npy")
    ap.add_argument("--bpe", default="",
                    help="CLIP BPE merges file (needed for --features-for)")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if hasattr(ckpt, "state_dict"):
        state = ckpt.state_dict()
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        state = ckpt["state_dict"]
    else:
        state = ckpt

    os.makedirs(args.out_dir, exist_ok=True)
    visual = {k[len("visual."):]: v for k, v in state.items()
              if k.startswith("visual.")}
    if not visual:
        raise SystemExit("no visual.* keys found — is this a full CLIP ckpt?")
    torch.save(visual, os.path.join(args.out_dir, args.visual_name))
    print(f"wrote visual tower: {len(visual)} tensors -> {args.visual_name}")

    if args.text or args.features_for:
        text_keys = ("positional_embedding", "text_projection",
                     "token_embedding.weight", "ln_final.weight",
                     "ln_final.bias")
        text = {k: v for k, v in state.items()
                if k in text_keys or k.startswith("transformer.")}
        name = f"text_{args.visual_name}"
        torch.save(text, os.path.join(args.out_dir, name))
        print(f"wrote text tower: {len(text)} tensors -> {name}")

    if args.features_for:
        import numpy as np

        from unite_tpu.models.clip_text import (
            CLIPTextTransformer,
            PROMPT,
            SimpleTokenizer,
            get_class_names,
            text_state_to_flax_params,
        )
        from unite_tpu.utils.torch_import import merge_params

        import jax
        import jax.numpy as jnp

        tokenizer = SimpleTokenizer(args.bpe)
        names = get_class_names(args.features_for)
        tokens = tokenizer.tokenize([PROMPT.format(c) for c in names])
        width = state["ln_final.weight"].shape[0]
        model = CLIPTextTransformer(
            width=width, heads=width // 64,
            embed_dim=state["text_projection"].shape[1],
            layers=len({k.split(".")[2] for k in state
                        if k.startswith("transformer.resblocks.")}),
        )
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(tokens[:1]))["params"]
        loaded = text_state_to_flax_params(text)
        params, _, _ = merge_params(params, loaded, strict_shapes=False)
        feats = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
        out = os.path.join(args.out_dir,
                           f"text_features_{args.features_for}.npy")
        np.save(out, feats.astype(np.float32))
        print(f"wrote zero-shot text features {feats.shape} -> {out}")


if __name__ == "__main__":
    main()
