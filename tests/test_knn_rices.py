"""kNN ops + RICES pipeline tests (exactness vs numpy brute force)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from explicit_alignment_for_vqa_tasks_tpu.in_context_example_selection.rices import (  # noqa: E402,E501
    image_knn_from_text_knn,
    joint_ranking,
    question_knn,
    random_examples,
)
from explicit_alignment_for_vqa_tasks_tpu.ops.knn import (  # noqa: E402
    grouped_knn_search,
    knn_search,
)


class TestKnnSearch:
    def test_matches_numpy_bruteforce(self):
        rng = np.random.default_rng(0)
        db = rng.standard_normal((200, 32)).astype(np.float32)
        q = rng.standard_normal((37, 32)).astype(np.float32)
        sims, idx = knn_search(q, db, k=5, query_chunk=16)
        dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        scores = qn @ dbn.T
        want_idx = np.argsort(-scores, axis=1)[:, :5]
        np.testing.assert_array_equal(idx, want_idx)
        np.testing.assert_allclose(
            sims, np.take_along_axis(scores, want_idx, axis=1), rtol=1e-5,
            atol=1e-5,
        )

    def test_grouped_masked(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((4, 8)).astype(np.float32)
        c = rng.standard_normal((4, 10, 8)).astype(np.float32)
        mask = np.ones((4, 10), dtype=bool)
        mask[0, 5:] = False  # only 5 valid candidates in group 0
        sims, idx = grouped_knn_search(q, c, mask, k=10)
        assert np.all(idx[0][:5] < 5)
        assert np.all(np.isneginf(sims[0][5:]))


def make_items(n, qid_base, img_base):
    return [
        {
            "question_id": qid_base + i, "img_key": img_base + i // 2,
            "question": f"q{i}", "gold_answer": f"a{i}",
        }
        for i in range(n)
    ]


class TestRICES:
    def test_pipeline_shapes_and_order(self):
        rng = np.random.default_rng(2)
        train_items = make_items(12, 1000, 100)
        val_items = make_items(4, 2000, 500)
        d = 16
        train_text = {
            str(item["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for item in train_items
        }
        val_text = {
            str(item["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for item in val_items
        }
        train_img = {
            str(item["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for item in train_items
        }
        val_img = {
            str(item["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for item in val_items
        }

        q_nns = question_knn(train_text, val_text, k=8)
        assert len(q_nns) == 4
        first = next(iter(q_nns.values()))
        assert len(first["question_ids"]) == 8
        # similarities descending
        assert np.all(np.diff(first["similarities"]) <= 1e-6)

        i_nns = image_knn_from_text_knn(
            q_nns, train_items, val_items, train_img, val_img
        )
        assert len(i_nns) == 4
        entry = i_nns[val_items[0]["question_id"]]
        assert len(entry["img_keys"]) == len(set(entry["img_keys"]))

        rices = joint_ranking(i_nns, q_nns, train_items, val_items, top_k=5)
        assert set(rices) == {str(i["question_id"]) for i in val_items}
        examples = rices[str(val_items[0]["question_id"])]
        assert len(examples) <= 5
        assert {"question_id", "img_key", "question", "gold_answer"} <= set(
            examples[0]
        )

    def test_stage3_exact_vs_bruteforce_with_shared_images(self):
        """The vectorized stage 3 (whole-image-matrix matmul + gather)
        must match per-question brute-force cosine over the UNIQUE images
        of each neighbour pool — many questions share images here."""
        rng = np.random.default_rng(7)
        # 30 train questions over only 9 images (heavy sharing)
        train_items = [
            {"question_id": 1000 + i, "img_key": 100 + (i * 7) % 9,
             "question": f"q{i}", "gold_answer": f"a{i}"}
            for i in range(30)
        ]
        val_items = make_items(5, 2000, 500)
        d = 8
        train_img = {
            str(100 + j): rng.standard_normal((1, d)).astype(np.float32)
            for j in range(9)
        }
        val_img = {
            str(item["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for item in val_items
        }
        # fake question-kNN pools: a different subset per val question
        q_nns = {}
        for i, item in enumerate(val_items):
            pool = [1000 + (i * 3 + j) % 30 for j in range(12)]
            q_nns[str(item["question_id"])] = {
                "question_ids": pool,
                "similarities": np.linspace(1, 0, 12).astype(np.float32),
            }
        got = image_knn_from_text_knn(
            q_nns, train_items, val_items, train_img, val_img,
            group_chunk=2,  # force multiple chunks
        )
        by_qid = {it["question_id"]: it for it in train_items}
        for item in val_items:
            qid = item["question_id"]
            pool = q_nns[str(qid)]["question_ids"]
            uniq_keys = list(dict.fromkeys(
                by_qid[q]["img_key"] for q in pool
            ))
            q_vec = val_img[str(item["img_key"])].reshape(-1)
            q_vec = q_vec / np.linalg.norm(q_vec)

            def cos(key):
                v = train_img[str(key)].reshape(-1)
                return float(q_vec @ (v / np.linalg.norm(v)))

            want = sorted(uniq_keys, key=cos, reverse=True)
            entry = got[qid]
            assert entry["img_keys"] == want
            sims = np.asarray(entry["similarities"]).reshape(-1)
            np.testing.assert_allclose(
                sims, [cos(k) for k in want], rtol=1e-5, atol=1e-6
            )
            assert np.all(np.diff(sims) <= 1e-6)  # descending

    def test_joint_ordering_ascending_best_last(self):
        # construct controlled similarities: qid 1001 should win
        train_items = make_items(4, 1000, 100)
        val_items = [{"question_id": 2000, "img_key": 500,
                      "question": "q", "gold_answer": "a"}]
        q_nns = {"2000": {
            "question_ids": [1000, 1001, 1002, 1003],
            "similarities": np.asarray([0.1, 0.9, 0.5, 0.2]),
        }}
        i_nns = {2000: {
            "similarities": np.asarray([[0.5, 0.5, 0.5]]),
            "img_keys": [100, 100, 101],  # img of 1000/1001 is 100
        }}
        rices = joint_ranking(i_nns, q_nns, train_items, val_items, top_k=3)
        examples = rices["2000"]
        # best (1001: 0.9 + 0.5) must be LAST
        assert examples[-1]["question_id"] == 1001

    def test_question_only_variant(self):
        train_items = make_items(6, 1000, 100)
        val_items = [{"question_id": 2000, "img_key": 500,
                      "question": "q", "gold_answer": "a"}]
        q_nns = {"2000": {
            "question_ids": [1000 + i for i in range(6)],
            "similarities": np.linspace(1.0, 0.0, 6),
        }}
        rices = joint_ranking({}, q_nns, train_items, val_items, top_k=4,
                              question_only=True)
        examples = rices["2000"]
        assert examples[-1]["question_id"] == 1000  # highest similarity last

    def test_run_full_pipeline_files(self, tmp_path):
        import pickle

        from explicit_alignment_for_vqa_tasks_tpu.\
            in_context_example_selection.rices import run_full_pipeline

        rng = np.random.default_rng(5)
        train_items = make_items(10, 1000, 100)
        val_items = make_items(3, 2000, 500)
        d = 8

        def dump(obj, name):
            path = tmp_path / name
            path.write_bytes(pickle.dumps(obj))
            return str(path)

        train_text = dump({
            str(i["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in train_items
        }, "tt.pkl")
        val_text = dump({
            str(i["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in val_items
        }, "vt.pkl")
        train_img = dump({
            str(i["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in train_items
        }, "ti.pkl")
        val_img = dump({
            str(i["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in val_items
        }, "vi.pkl")

        out = tmp_path / "rices.pkl"
        rices = run_full_pipeline(
            train_text, val_text, train_img, val_img,
            train_items, val_items, str(out), k_questions=6,
        )
        assert len(rices) == 3
        with open(out, "rb") as fh:
            on_disk = pickle.load(fh)
        assert set(on_disk) == set(rices)

    def test_random_baseline(self):
        train_items = make_items(20, 1000, 100)
        out = random_examples(train_items, [2000, 2001], num_examples=5,
                              seed=7)
        assert len(out) == 2 and len(out["2000"]) == 5
        qids = [e["question_id"] for e in out["2000"]]
        assert len(set(qids)) == 5  # without replacement


class TestMultiChipKnn:
    """Round-5 directive (VERDICT r4 #7): the L0 bulk tools scale past one
    chip. On the virtual 8-device CPU mesh, the sharded kNN paths must
    return the SAME NEIGHBOURS as the single-device results; similarities
    may differ by matmul-tiling rounding (per-shard matmul shapes reduce
    in a different order), so they are compared to 1e-6. The merge
    preserves lowest-index tie-breaking on bit-equal scores."""

    def _mesh(self, n=4):
        from explicit_alignment_for_vqa_tasks_tpu.parallel.mesh import (
            make_data_mesh,
        )

        return make_data_mesh(n)

    def test_knn_search_mesh_equals_single_device(self):
        rng = np.random.default_rng(3)
        # N=203 deliberately NOT divisible by 4 (pads with masked rows)
        db = rng.standard_normal((203, 32)).astype(np.float32)
        q = rng.standard_normal((37, 32)).astype(np.float32)
        sims1, idx1 = knn_search(q, db, k=7, query_chunk=16)
        sims2, idx2 = knn_search(q, db, k=7, query_chunk=16,
                                 mesh=self._mesh())
        np.testing.assert_array_equal(idx1, idx2)
        np.testing.assert_allclose(sims1, sims2, rtol=1e-6, atol=1e-6)

    def test_knn_search_mesh_k_larger_than_shard(self):
        # k=6 > rows_per_shard (16/8 = 2): local top-k clamps to the
        # shard size and the merge still recovers the exact global top-k
        rng = np.random.default_rng(4)
        db = rng.standard_normal((16, 8)).astype(np.float32)
        q = rng.standard_normal((5, 8)).astype(np.float32)
        sims1, idx1 = knn_search(q, db, k=6)
        sims2, idx2 = knn_search(q, db, k=6, mesh=self._mesh(8))
        np.testing.assert_array_equal(idx1, idx2)
        np.testing.assert_allclose(sims1, sims2, rtol=1e-6, atol=1e-6)

    def test_knn_search_mesh_tie_breaking(self):
        # duplicated rows across shard boundaries: ties must resolve to
        # the LOWEST global index, like single-device lax.top_k / FAISS
        rng = np.random.default_rng(5)
        base = rng.standard_normal((6, 8)).astype(np.float32)
        db = np.concatenate([base, base, base, base])  # 24 rows, 4 copies
        q = base[:3]
        sims1, idx1 = knn_search(q, db, k=8)
        sims2, idx2 = knn_search(q, db, k=8, mesh=self._mesh())
        np.testing.assert_array_equal(idx1, idx2)
        np.testing.assert_allclose(sims1, sims2, rtol=1e-6, atol=1e-6)

    def test_rices_pipeline_mesh_equals_single_device(self, tmp_path):
        import pickle

        from explicit_alignment_for_vqa_tasks_tpu.in_context_example_selection.rices import (  # noqa: E501
            run_full_pipeline,
        )

        rng = np.random.default_rng(6)
        train_items = make_items(24, 1000, 100)
        val_items = make_items(6, 2000, 500)
        d = 16

        def dump(obj, name):
            p = tmp_path / name
            p.write_bytes(pickle.dumps(obj))
            return str(p)

        train_text = dump({
            str(i["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in train_items
        }, "tt.pkl")
        val_text = dump({
            str(i["question_id"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in val_items
        }, "vt.pkl")
        train_img = dump({
            str(i["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in train_items
        }, "ti.pkl")
        val_img = dump({
            str(i["img_key"]):
                rng.standard_normal((1, d)).astype(np.float32)
            for i in val_items
        }, "vi.pkl")

        single = run_full_pipeline(
            train_text, val_text, train_img, val_img,
            train_items, val_items, str(tmp_path / "r1.pkl"), k_questions=8,
        )
        meshed = run_full_pipeline(
            train_text, val_text, train_img, val_img,
            train_items, val_items, str(tmp_path / "r2.pkl"), k_questions=8,
            mesh=self._mesh(),
        )
        assert single == meshed
