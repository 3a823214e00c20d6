"""RICES in-context example selection (Retrieval of In-Context ExampleS).

TPU-native re-implementation of the reference's 4-stage FAISS pipeline
(reference: src/in_context_example_selection/*, run order per
reference README.md:151-158):

  1. question kNN: val questions -> top-2048 train questions by CLIP text
     embedding cosine (get_question_knn.py:65-83)
  2. reformat FAISS rows to train question ids
     (reformatting_faiss_output.py:17-25)
  3. image kNN within each question-kNN pool: val image vs the UNIQUE
     train images of its question neighbours
     (get_image_knn_from_text_knn.py:57-108)
  4. joint ranking: inner-join by img_key, joint = sim_img + sim_question,
     top-32 stored ASCENDING so the best example is LAST — consumed by
     ``[-num_shots:]`` slicing (get_average_similarities.py:46-71)

FAISS IndexFlatIP on L2-normalized vectors is exact cosine top-k, which we
compute as sharded matmuls + ``lax.top_k`` on TPU (ops/knn.py). All pickle
artifact schemas match the reference so files interoperate both ways.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..ops.knn import grouped_knn_search, knn_search

logger = logging.getLogger(__name__)

TOP_K_QUESTIONS = 2048
TOP_K_EXAMPLES = 32


def _stack_embedding_dict(embeddings: Dict[str, np.ndarray]):
    keys = list(embeddings.keys())
    matrix = np.stack([np.asarray(embeddings[k]) for k in keys])
    return keys, matrix.reshape(len(keys), -1).astype(np.float32)


def question_knn(
    train_text_embeddings: Dict[str, np.ndarray],
    val_text_embeddings: Dict[str, np.ndarray],
    k: int = TOP_K_QUESTIONS,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Stages 1+2: cosine top-k of every val question over train questions.

    Returns the ``text_knns_reformatted.pkl`` schema:
    ``{str(val_qid): {"question_ids": [...], "similarities": (k,)}}``.
    """
    train_ids, train_matrix = _stack_embedding_dict(train_text_embeddings)
    val_ids, val_matrix = _stack_embedding_dict(val_text_embeddings)
    sims, idx = knn_search(val_matrix, train_matrix, k)
    train_ids_arr = np.asarray(train_ids, dtype=object)
    return {
        str(val_ids[i]): {
            "question_ids": train_ids_arr[idx[i]].tolist(),
            "similarities": sims[i],
        }
        for i in range(len(val_ids))
    }


def image_knn_from_text_knn(
    text_knns: Dict[str, Dict],
    train_data_items: Sequence[Any],
    val_data_items: Sequence[Any],
    train_image_embeddings: Dict[str, np.ndarray],
    val_image_embeddings: Dict[str, np.ndarray],
    group_chunk: int = 128,
) -> Dict[Any, Dict]:
    """Stage 3: per val question, rank the UNIQUE train images of its
    question neighbours against the val image embedding.

    Returns the ``image_knns_reformatted.pkl`` schema:
    ``{val_qid: {"similarities": (1, C), "img_keys": [ordered desc]}}``.
    """
    by_qid = {item["question_id"]: item for item in train_data_items}
    dim = next(iter(train_image_embeddings.values())).reshape(-1).shape[0]

    # gather per-question candidate image keys (unique, order preserved)
    queries, candidate_keys = [], []
    val_qids = []
    for item in val_data_items:
        qid = item["question_id"]
        neighbours = text_knns.get(str(qid))
        if neighbours is None:
            logger.warning("no question neighbours for %s", qid)
            continue
        val_emb = val_image_embeddings.get(str(item["img_key"]))
        if val_emb is None:
            logger.warning("no image embedding for %s", item["img_key"])
            continue
        seen: Dict[Any, None] = {}
        for train_qid in neighbours["question_ids"]:
            img_key = by_qid[int(train_qid)]["img_key"]
            if img_key not in seen:
                seen[img_key] = None
        keys = list(seen)
        queries.append(np.asarray(val_emb).reshape(-1))
        candidate_keys.append(keys)
        val_qids.append(qid)

    results: Dict[Any, Dict] = {}
    for start in range(0, len(val_qids), group_chunk):
        chunk_keys = candidate_keys[start:start + group_chunk]
        chunk_queries = np.stack(queries[start:start + group_chunk])
        width = max(len(k) for k in chunk_keys)
        cands = np.zeros((len(chunk_keys), width, dim), dtype=np.float32)
        mask = np.zeros((len(chunk_keys), width), dtype=bool)
        for row, keys in enumerate(chunk_keys):
            for col, key in enumerate(keys):
                cands[row, col] = np.asarray(
                    train_image_embeddings[str(key)]
                ).reshape(-1)
            mask[row, :len(keys)] = True
        sims, idx = grouped_knn_search(chunk_queries, cands, mask, k=width)
        for row, keys in enumerate(chunk_keys):
            n = len(keys)
            order = idx[row][:n]
            results[val_qids[start + row]] = {
                "similarities": sims[row][:n][None, :],
                "img_keys": [keys[int(j)] for j in order],
            }
    return results


def joint_ranking(
    image_nns: Dict[Any, Dict],
    question_nns: Dict[str, Dict],
    train_data_items: Sequence[Any],
    val_data_items: Sequence[Any],
    top_k: int = TOP_K_EXAMPLES,
    question_only: bool = False,
) -> Dict[str, List[Dict]]:
    """Stage 4: joint = sim_img + sim_question over the img_key inner
    join; top-32 stored ASCENDING (best example last). With
    ``question_only``, rank by question similarity alone
    (``rices_questions_only.pkl``)."""
    by_qid = {item["question_id"]: item for item in train_data_items}

    def img_key_of(train_qid) -> Any:
        return by_qid[int(train_qid)]["img_key"]

    rices: Dict[str, List[Dict]] = {}
    for item in val_data_items:
        qid = item["question_id"]
        q_nns = question_nns.get(str(qid))
        if q_nns is None:
            continue
        q_sims = np.asarray(q_nns["similarities"]).reshape(-1)
        rows: List[tuple] = []  # (joint_sim, img_key, train_qid)
        if question_only:
            for train_qid, sim in zip(q_nns["question_ids"], q_sims):
                rows.append((float(sim), img_key_of(train_qid), train_qid))
        else:
            i_nns = image_nns.get(qid)
            if i_nns is None:
                continue
            img_sims = {
                key: float(sim)
                for key, sim in zip(
                    i_nns["img_keys"],
                    np.asarray(i_nns["similarities"]).reshape(-1),
                )
            }
            for train_qid, q_sim in zip(q_nns["question_ids"], q_sims):
                key = img_key_of(train_qid)
                if key in img_sims:
                    rows.append(
                        (img_sims[key] + float(q_sim), key, train_qid)
                    )
        rows.sort(key=lambda r: r[0], reverse=True)
        rows = rows[:top_k]
        rows.reverse()  # ascending: best example LAST
        rices[str(qid)] = [
            {
                "question_id": train_qid,
                "img_key": img_key,
                "question": by_qid[int(train_qid)]["question"],
                "gold_answer": by_qid[int(train_qid)]["gold_answer"],
            }
            for _, img_key, train_qid in rows
        ]
    return rices


def random_examples(
    train_data_items: Sequence[Any],
    val_question_ids: Sequence[Any],
    num_examples: int = 16,
    seed: int = 2021,
) -> Dict[str, List[Dict]]:
    """RANDOM baseline (reference: src/utils/in_context_examples.py:286-304)."""
    np.random.seed(seed)
    by_qid = {item["question_id"]: item for item in train_data_items}
    qids = list(by_qid)
    out: Dict[str, List[Dict]] = {}
    for val_qid in val_question_ids:
        chosen = np.random.choice(len(qids), size=num_examples,
                                  replace=False)
        out[str(val_qid)] = [
            {
                "question_id": by_qid[qids[i]]["question_id"],
                "img_key": by_qid[qids[i]]["img_key"],
                "question": by_qid[qids[i]]["question"],
                "gold_answer": by_qid[qids[i]]["gold_answer"],
            }
            for i in chosen
        ]
    return out


def run_full_pipeline(
    train_text_embeddings_path: str,
    val_text_embeddings_path: str,
    train_image_embeddings_path: str,
    val_image_embeddings_path: str,
    train_data_items: Sequence[Any],
    val_data_items: Sequence[Any],
    out_path: str,
    question_only: bool = False,
    k_questions: int = TOP_K_QUESTIONS,
) -> Dict[str, List[Dict]]:
    """All 4 stages end to end, writing the rices pickle."""

    def load(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)

    logger.info("stage 1+2: question kNN")
    question_nns = question_knn(
        load(train_text_embeddings_path), load(val_text_embeddings_path),
        k=k_questions,
    )
    image_nns: Optional[Dict] = None
    if not question_only:
        logger.info("stage 3: image kNN within question pools")
        image_nns = image_knn_from_text_knn(
            question_nns, train_data_items, val_data_items,
            load(train_image_embeddings_path),
            load(val_image_embeddings_path),
        )
    logger.info("stage 4: joint ranking")
    rices = joint_ranking(
        image_nns or {}, question_nns, train_data_items, val_data_items,
        question_only=question_only,
    )
    with open(out_path, "wb") as fh:
        pickle.dump(rices, fh)
    logger.info("wrote %d example lists to %s", len(rices), out_path)
    return rices
