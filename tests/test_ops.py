"""Training-data ops: dedup, similarity, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox jumped over the lazy dog",  # near dup of 0
        "completely different content about ray data pipelines",
        "another unrelated document discussing arrow tables",
        "the quick brown fox jumps over the lazy dog!",  # near dup of 0
    ]
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    )


def test_exact_dedup(docs_ds):
    from wrangler_ray.ops.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 2, 3, 4, 5]  # only the exact dup removed


def test_minhash_lsh_dedup(docs_ds):
    from wrangler_ray.ops.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(docs_ds, jaccard_threshold=0.7).to_pandas()
    ids = sorted(out["doc_id"])
    # 0,1,2,5 form a near-dup cluster → representative 0 survives
    assert 0 in ids and 3 in ids and 4 in ids
    assert 1 not in ids and 5 not in ids


def test_ngram_jaccard_symmetric():
    from wrangler_ray.ops.dedup import ngram_jaccard

    a = "the quick brown fox"
    b = "the quick brown fox jumps"
    assert ngram_jaccard(a, a) == 1.0
    assert 0 < ngram_jaccard(a, b) < 1
    assert ngram_jaccard(a, b) == ngram_jaccard(b, a)


def test_simhash_dedup(docs_ds):
    from wrangler_ray.ops.dedup import simhash_dedup

    out = simhash_dedup(docs_ds, max_hamming=3).to_pandas()
    ids = sorted(out["doc_id"])
    assert 0 in ids and 1 not in ids  # identical text → identical simhash


def test_embedding_dedup(ray_session):
    import ray.data as rd
    from wrangler_ray.ops.dedup import embedding_dedup

    rng = np.random.RandomState(0)
    base = rng.randn(4, 16).astype(np.float32)
    vecs = np.vstack([base, base[0] + rng.randn(16) * 1e-3])  # near-dup of row 0
    t = pa.table(
        {
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = embedding_dedup(rd.from_arrow(t), cosine_threshold=0.99).to_pandas()
    ids = sorted(out["vec_id"])
    assert ids == [0, 1, 2, 3]  # row 4 deduped against row 0


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd
    from wrangler_ray.ops.similarity import brute_force_topk

    rng = np.random.RandomState(1)
    vecs = rng.randn(200, 8).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    q = rng.randn(3, 8).astype(np.float32)
    got = brute_force_topk(rd.from_arrow(t), q, k=5).to_pandas()
    # numpy oracle
    qa = q / np.linalg.norm(q, axis=1, keepdims=True)
    va = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = qa @ va.T
    for qi in range(3):
        expect = set(np.argsort(-sims[qi])[:5])
        mine = set(got[got["query_idx"] == qi]["vec_id"])
        assert mine == expect


def test_lsh_topk_recall(ray_session):
    import ray.data as rd
    from wrangler_ray.ops.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(2)
    vecs = rng.randn(500, 16).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    q = vecs[:2] + rng.randn(2, 16).astype(np.float32) * 0.01
    exact = brute_force_topk(rd.from_arrow(t), q, k=1).to_pandas()
    approx = lsh_topk(rd.from_arrow(t), q, k=1, num_planes=8).to_pandas()
    # the true nearest neighbor of a barely-perturbed vector must be found
    assert list(approx["vec_id"])[:1] == list(exact["vec_id"])[:1]


def test_text_analysis(ray_session):
    import ray.data as rd
    from wrangler_ray.ops.text import analyze

    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "The cat and the dog sat on the mat with a hat and a bat.",
                "der hund und die katze schlafen durch den schönen nachmittag",
            ],
        }
    )
    out = analyze(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert list(out["lang_pred"]) == ["en", "de"]
    assert (out["n_ws_tokens"] > 5).all()
    assert (out["n_bpe_tokens"] >= out["n_ws_tokens"]).all()
    assert out["quality"].between(0, 1).all()
    assert (out["fingerprint"] > 0).all()


def test_multimodal_image_pipeline(ray_session):
    import ray.data as rd
    from wrangler_ray.ops.multimodal import image_pipeline, make_fake_image_table

    t = make_fake_image_table(n=32)
    out = image_pipeline(rd.from_arrow(t), batch_size=8).to_pandas()
    assert len(out) == 32
    assert out["decoded_ok"].all()
    assert out["pix_mean"].between(0, 255).all()
    assert (out["resized_nbytes"] == 224 * 224 * 3).all()
    # determinism: same payload → same stats
    out2 = image_pipeline(rd.from_arrow(t), batch_size=16).to_pandas()
    assert np.allclose(
        out.sort_values("id")["pix_mean"].to_numpy(),
        out2.sort_values("id")["pix_mean"].to_numpy(),
    )


def test_multimodal_real_decode_is_gated():
    from wrangler_ray.ops.multimodal import DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)


def test_dedup_auto_switch_crosses_driver_cap(docs_ds):
    """With max_driver_edges=0 every run crosses the cap and must auto-route
    to the distributed label-propagation path — same survivors, no raise."""
    from wrangler_ray.ops.dedup import minhash_lsh_dedup, simhash_dedup

    driver = sorted(
        minhash_lsh_dedup(docs_ds, jaccard_threshold=0.7).to_pandas()["doc_id"]
    )
    auto = sorted(
        minhash_lsh_dedup(
            docs_ds, jaccard_threshold=0.7, max_driver_edges=0
        ).to_pandas()["doc_id"]
    )
    assert auto == driver

    sh_driver = sorted(simhash_dedup(docs_ds, max_hamming=3).to_pandas()["doc_id"])
    sh_auto = sorted(
        simhash_dedup(docs_ds, max_hamming=3, max_driver_edges=0).to_pandas()["doc_id"]
    )
    assert sh_auto == sh_driver
