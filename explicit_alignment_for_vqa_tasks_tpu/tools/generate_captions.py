"""Caption images with a trained mapping network.

Script equivalent of the reference's ``generate_captions.ipynb``: load a
mapper checkpoint, project CLIP embeddings, and generate captions with the
"Summarize: <extra_id_0>" prompt and an optional forced decoder prefix
("A picture of") via the forced-decode path.
"""

from __future__ import annotations

import argparse
import logging
import pickle
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def generate_captions(
    model,
    tokenizer,
    clip_embeddings: np.ndarray,          # (N, prefix_size)
    prompt: str = "Summarize: <extra_id_0>",
    forced_prefix: Optional[str] = "A picture of",
    max_new_tokens: int = 20,
    batch_size: int = 32,
) -> List[str]:
    """Returns one caption per embedding row."""
    import jax.numpy as jnp

    captions: List[str] = []
    prompt_enc = tokenizer([prompt], return_tensors="np")
    decoder_input_ids = None
    if forced_prefix:
        forced = tokenizer(
            [forced_prefix], return_tensors="np"
        )["input_ids"][:, :-1]  # drop EOS; decode continues the prefix
        decoder_input_ids = np.concatenate(
            [np.zeros((1, 1), dtype=forced.dtype), forced], axis=1
        )

    for start in range(0, len(clip_embeddings), batch_size):
        chunk = np.asarray(clip_embeddings[start:start + batch_size],
                           dtype=np.float32)
        n = len(chunk)
        tokens_batch = np.repeat(prompt_enc["input_ids"], n, axis=0)
        mask_batch = np.repeat(prompt_enc["attention_mask"], n, axis=0)
        kwargs = dict(
            prefix=jnp.asarray(chunk[:, None, :]),
            question_tokens=jnp.asarray(tokens_batch),
            question_mask=jnp.asarray(mask_batch),
            max_new_tokens=max_new_tokens,
        )
        if decoder_input_ids is not None:
            kwargs["decoder_input_ids"] = jnp.asarray(
                np.repeat(decoder_input_ids, n, axis=0)
            )
        tokens, _ = model.generate(**kwargs)
        for row in np.asarray(tokens):
            text = tokenizer.decode(row.tolist(), skip_special_tokens=True)
            if forced_prefix:
                text = f"{forced_prefix} {text}".strip()
            captions.append(text)
    return captions


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="jsonnet config (model definition)")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--embeddings", required=True,
                        help="pickle {key: (1, d)} or parquet with "
                             "clip_embeddings")
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=32)
    parser.add_argument("--no_forced_prefix", action="store_true")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..data.tokenization import load_tokenizer
    from ..trainers.checkpointing import load_checkpoint
    from ..trainers.model_factory import build_model_from_config
    from ..utils.config_system import get_config_from_file

    config = get_config_from_file(args.config)
    config.mode = "test"
    model, _ = build_model_from_config(config)
    state = dict(load_checkpoint(args.checkpoint))
    state.pop("epoch", None)
    model.params["mapper"] = state["mapper"]
    tokenizer = load_tokenizer(
        config.model_config.TokenizerClass,
        config.model_config.TokenizerModelVersion,
        config.model_config.get("SPECIAL_TOKENS", {}),
    )

    if args.embeddings.endswith(".parquet"):
        import pyarrow.parquet as pq

        table = pq.read_table(args.embeddings)
        embeddings = np.stack([
            np.asarray(e, dtype=np.float32).reshape(-1)
            for e in table.column("clip_embeddings").to_pylist()
        ])[:args.limit]
    else:
        with open(args.embeddings, "rb") as fh:
            data = pickle.load(fh)
        embeddings = np.stack([
            np.asarray(v).reshape(-1) for v in list(data.values())
        ])[:args.limit]

    captions = generate_captions(
        model, tokenizer, embeddings,
        forced_prefix=None if args.no_forced_prefix else "A picture of",
    )
    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(captions))
    logger.info("wrote %d captions to %s", len(captions), args.out)


if __name__ == "__main__":
    main()
