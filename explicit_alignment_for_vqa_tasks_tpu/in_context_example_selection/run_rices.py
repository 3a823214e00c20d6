"""Run the full RICES pipeline from artifact files (CLI).

End-to-end equivalent of the reference's 4 scripts run in order
(reference README.md:151-158): question kNN -> reformat -> image kNN ->
joint ranking, all on-TPU (ops/knn.py), writing rices.pkl (or
rices_questions_only.pkl with --question_only).
"""

from __future__ import annotations

import argparse
import logging
import pickle

logger = logging.getLogger(__name__)


def _load_cache(path: str):
    with open(path, "rb") as fh:
        data = pickle.load(fh)
    if isinstance(data, dict) and "cache" in data:
        data = data["cache"]
    return data


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_cache", required=True)
    parser.add_argument("--val_cache", required=True)
    parser.add_argument("--train_text_embeddings", required=True)
    parser.add_argument("--val_text_embeddings", required=True)
    parser.add_argument("--train_image_embeddings", default="")
    parser.add_argument("--val_image_embeddings", default="")
    parser.add_argument("--out", required=True)
    parser.add_argument("--question_only", action="store_true")
    parser.add_argument("--k_questions", type=int, default=2048)
    parser.add_argument(
        "--mesh_data", type=int, default=1,
        help="shard the kNN databases over N chips (-1 = all devices); "
             "results are exactly equal to single-chip",
    )
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..parallel.mesh import make_data_mesh
    from .rices import run_full_pipeline

    train_items = _load_cache(args.train_cache)["data_items"]
    val_items = _load_cache(args.val_cache)["data_items"]
    run_full_pipeline(
        args.train_text_embeddings, args.val_text_embeddings,
        args.train_image_embeddings, args.val_image_embeddings,
        train_items, val_items, args.out,
        question_only=args.question_only, k_questions=args.k_questions,
        mesh=make_data_mesh(args.mesh_data),
    )


if __name__ == "__main__":
    main()
