"""Extract per-question CLIP text embeddings for VQA2 (batched, TPU).

Reference: src/tools/extract_contrastive_text_embeddings.py:15-72. Output
artifact: ``{str(question_id): float32 [1, proj_dim]}`` pickle.
"""

from __future__ import annotations

import argparse
import json
import logging
import pickle
from typing import Dict

import numpy as np

from .clip_encoder import ClipTextEncoder

logger = logging.getLogger(__name__)


def extract(
    question_file: str,
    out_path: str,
    batch_size: int = 512,
    encoder: ClipTextEncoder = None,
) -> Dict[str, np.ndarray]:
    with open(question_file, "r", encoding="utf-8") as fh:
        questions = json.load(fh)["questions"]
    encoder = encoder or ClipTextEncoder(batch_size=batch_size)
    embeddings: Dict[str, np.ndarray] = {}
    texts = [q["question"] for q in questions]
    qids = [q["question_id"] for q in questions]
    for start in range(0, len(texts), batch_size):
        chunk = encoder.encode_texts(texts[start:start + batch_size])
        for qid, emb in zip(qids[start:start + batch_size], chunk):
            embeddings[str(qid)] = emb[None, :]
    with open(out_path, "wb") as fh:
        pickle.dump(embeddings, fh)
    logger.info("wrote %d text embeddings to %s", len(embeddings), out_path)
    return embeddings


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--question_file", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument(
        "--model_version", default="openai/clip-vit-large-patch14-336"
    )
    parser.add_argument(
        "--mesh_data", type=int, default=1,
        help="shard each encode batch over N chips (-1 = all devices); "
             "batch_size must divide N",
    )
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    from ..parallel.mesh import make_data_mesh

    encoder = ClipTextEncoder(
        model_version=args.model_version, batch_size=args.batch_size,
        mesh=make_data_mesh(args.mesh_data),
    )
    extract(args.question_file, args.out, args.batch_size, encoder)


if __name__ == "__main__":
    main()
