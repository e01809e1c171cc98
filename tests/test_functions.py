"""Dedup / text-analysis / KNN / multimodal function tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from chronon_ray.functions.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from chronon_ray.functions.knn import brute_force_knn, build_ivf, ivf_knn
from chronon_ray.functions.multimodal import (
    AudioFrameStage,
    DecodeImageStage,
    ImageFeatureStage,
    VideoFrameSampleStage,
    synth_media_table,
)
from chronon_ray.functions.text import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    TokenCountStage,
)


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def neardup_docs(ray_session):
    """50 base docs + near-copies (1-char edits) + exact copies."""
    rng = np.random.Generator(np.random.PCG64(3))
    # large vocabulary so unrelated docs have genuinely low shingle overlap
    words = ["w" + format(x, "06x") for x in rng.integers(0, 1 << 24, size=2000)]
    rows = []
    did = 0
    for b in range(50):
        base = " ".join(rng.choice(words, size=60))
        rows.append((did, base, b))
        did += 1
        if b % 3 == 0:  # near-copy: swap one word
            toks = base.split()
            toks[5] = "CHANGED"
            rows.append((did, " ".join(toks), b))
            did += 1
        if b % 5 == 0:  # exact copy
            rows.append((did, base, b))
            did += 1
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "base": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    return tbl


def test_exact_dedup_vs_duckdb(docs_ds, duck):
    out = exact_dedup(docs_ds, on=["text"], id_col="doc_id", num_partitions=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = duck.sql("""
        select min(doc_id) as doc_id from documents group by text order by doc_id
    """).df()
    np.testing.assert_array_equal(out["doc_id"].to_numpy(), exp["doc_id"].to_numpy())


def test_minhash_finds_neardups(ray_session, neardup_docs):
    ds = ray.data.from_arrow(neardup_docs)
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5,
                              concurrency=None).to_pandas()
    pdf = neardup_docs.to_pandas()
    base_of = dict(zip(pdf["doc_id"], pdf["base"]))
    # every found pair shares a base (no false positives across bases)
    for _, r in pairs.iterrows():
        assert base_of[r["a"]] == base_of[r["b"]], (r["a"], r["b"])
    # every base with >1 doc is recalled as at least one pair
    sizes = pdf.groupby("base").size()
    multi = set(sizes[sizes > 1].index)
    found_bases = {base_of[a] for a in pairs["a"]}
    recall = len(found_bases & multi) / len(multi)
    assert recall >= 0.9, recall


def test_minhash_clusters(ray_session, neardup_docs):
    ds = ray.data.from_arrow(neardup_docs)
    clusters = minhash_dedup(ds, "text", "doc_id", threshold=0.5,
                             concurrency=None).to_pandas()
    pdf = neardup_docs.to_pandas().merge(clusters, on="doc_id")
    # docs in the same cluster must share a base
    for _, grp in pdf.groupby("cluster_id"):
        assert grp["base"].nunique() == 1


def test_simhash_pairs(ray_session, neardup_docs):
    ds = ray.data.from_arrow(neardup_docs)
    pairs = simhash_pairs(ds, "text", "doc_id", max_hamming=6).to_pandas()
    pdf = neardup_docs.to_pandas()
    base_of = dict(zip(pdf["doc_id"], pdf["base"]))
    assert len(pairs) > 0
    ok = sum(base_of[r["a"]] == base_of[r["b"]] for _, r in pairs.iterrows())
    assert ok / len(pairs) >= 0.9  # precision


def test_embedding_neardup(ray_session):
    rng = np.random.Generator(np.random.PCG64(4))
    base = rng.normal(size=(40, 64)).astype(np.float32)
    dup = base[:10] + rng.normal(scale=0.01, size=(10, 64)).astype(np.float32)
    emb = np.concatenate([base, dup])
    ids = np.arange(len(emb))
    tbl = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(list(emb), type=pa.list_(pa.float32()))})
    pairs = embedding_neardup_pairs(ray.data.from_arrow(tbl), "embedding",
                                    "vec_id", threshold=0.98, dim=64,
                                    concurrency=None).to_pandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(pairs["a"], pairs["b"])}
    expected = {(i, 40 + i) for i in range(10)}
    assert len(found & expected) >= 8  # LSH recall
    assert all(abs(a - b) == 40 for a, b in found)  # precision on this fixture


def test_brute_force_knn_exact(ray_session, sf_dir):
    corpus = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = corpus.to_pandas()
    emb = np.stack(pdf["embedding"].to_numpy())
    qm = emb[:5]
    qids = pdf["vec_id"].to_numpy()[:5]
    out = brute_force_knn(corpus, qids, qm, k=5).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    # numpy oracle
    norm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    qn = norm[:5]
    sim = qn @ norm.T
    for qi, qid in enumerate(qids):
        order = np.lexsort((pdf["vec_id"].to_numpy(), -sim[qi]))
        exp_ids = pdf["vec_id"].to_numpy()[order[:5]]
        got = out[out["query_id"] == qid]["neighbor_id"].to_numpy()
        np.testing.assert_array_equal(got, exp_ids)


def test_ivf_knn_recall(ray_session, sf_dir):
    corpus = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = corpus.to_pandas()
    emb = np.stack(pdf["embedding"].to_numpy())
    qm = emb[:5]
    qids = pdf["vec_id"].to_numpy()[:5]
    cent, assigned = build_ivf(corpus, n_clusters=8)
    out = ivf_knn(assigned, cent, qids, qm, k=5, nprobe=3).to_pandas()
    bf = brute_force_knn(corpus, qids, qm, k=5).to_pandas()
    recall = 0
    for qid in qids:
        a = set(out[out["query_id"] == qid]["neighbor_id"])
        b = set(bf[bf["query_id"] == qid]["neighbor_id"])
        recall += len(a & b) / len(b)
    assert recall / len(qids) >= 0.5


def test_hnsw_knn_recall_and_exact(ray_session, sf_dir):
    from chronon_ray.functions.knn import hnsw_knn

    corpus = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = corpus.to_pandas()
    emb = np.stack(pdf["embedding"].to_numpy())
    qm = emb[:5]
    qids = pdf["vec_id"].to_numpy()[:5]
    bf = brute_force_knn(corpus, qids, qm, k=5).to_pandas()
    # approximate regime: real graph beam search across 2 shards
    out = hnsw_knn(corpus, qids, qm, k=5, n_shards=2, ef_search=64).to_pandas()
    recall = 0
    for qid in qids:
        a = set(out[out["query_id"] == qid]["neighbor_id"])
        b = set(bf[bf["query_id"] == qid]["neighbor_id"])
        recall += len(a & b) / len(b)
    assert recall / len(qids) >= 0.8, recall / len(qids)
    # exact degenerate mode (ef >= shard size) == brute force, bit for bit
    ex = hnsw_knn(corpus, qids, qm, k=5, n_shards=3,
                  ef_search=10**9).to_pandas()
    cols = ["query_id", "rank", "neighbor_id"]
    ex = ex.sort_values(cols[:2]).reset_index(drop=True)
    bfs = bf.sort_values(cols[:2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ex[cols], bfs[cols])


def test_text_stages(docs_ds, duck):
    out = docs_ds.map_batches(LangIdStage(), batch_format="pandas") \
        .map_batches(QualityScoreStage(), batch_format="pandas") \
        .map_batches(TokenCountStage(), batch_format="pandas") \
        .map_batches(FingerprintStage(), batch_format="pandas") \
        .to_pandas()
    # token count matches SQL whitespace split
    exp = duck.sql("""
        select doc_id, len(string_split_regex(trim(text), '\\s+')) as n
        from documents order by doc_id
    """).df()
    got = out.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["n_tokens_ws"].to_numpy(), exp["n"].to_numpy())
    # the synthetic docs' text doesn't vary by the lang label — just check the
    # stage runs and emits known labels; real-language accuracy below
    assert got["lang_pred"].isin(["en", "de", "fr", "es", "zh", "unknown"]).all()
    # fingerprints: equal texts ⇒ equal fingerprints, distinct mostly distinct
    fp = got.groupby("text")["fingerprint"].nunique()
    assert (fp == 1).all()
    assert got["fingerprint"].nunique() > 0.9 * got["text"].nunique()
    assert got["quality_score"].between(0, 1).all()


def test_langid_real_sentences(ray_session):
    samples = {
        "en": "the quick brown fox jumped over the lazy dog and it was not seen again for days",
        "de": "der schnelle braune fuchs sprang über den faulen hund und die katze ist nicht mit ihm",
        "fr": "le renard brun rapide saute dans les bois et il est dans une maison pour la nuit",
        "es": "el zorro marrón salta sobre el perro perezoso y es una historia que se cuenta por la noche",
        "zh": "敏捷的棕色狐狸跳过了懒狗然后消失在森林里再也没有人见过它",
    }
    tbl = pa.table({"text": pa.array(list(samples.values())),
                    "lang": pa.array(list(samples.keys()))})
    out = ray.data.from_arrow(tbl).map_batches(
        LangIdStage(), batch_format="pandas").to_pandas()
    assert (out["lang_pred"] == out["lang"]).all(), out[["lang", "lang_pred"]]


def test_multimodal_plumbing(ray_session):
    tbl = synth_media_table(64)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(DecodeImageStage, fn_constructor_kwargs=dict(out_h=8, out_w=8),
                         batch_format="pyarrow", batch_size=16, concurrency=2) \
        .map_batches(ImageFeatureStage, fn_constructor_kwargs=dict(h=8, w=8),
                     batch_format="pyarrow", batch_size=16, concurrency=2)
    pdf = out.to_pandas()
    assert len(pdf) == 64
    assert len(pdf["pixels"].iloc[0]) == 8 * 8 * 3
    assert len(pdf["img_features"].iloc[0]) == 6
    # determinism: same payload → same pixels
    p0 = np.asarray(pdf["pixels"].iloc[0])
    again = ds.map_batches(DecodeImageStage(out_h=8, out_w=8),
                           batch_format="pyarrow", batch_size=16).to_pandas()
    np.testing.assert_array_equal(p0, np.asarray(again["pixels"].iloc[0]))
    # audio + video stages
    a = ds.map_batches(AudioFrameStage(), batch_format="pyarrow", batch_size=16).to_pandas()
    assert len(a["frame_energy"].iloc[0]) == 16
    v = ds.map_batches(VideoFrameSampleStage(), batch_format="pyarrow",
                       batch_size=16).to_pandas()
    assert len(v["frames"].iloc[0]) == 4
    # formats with no real decoder are explicitly stubbed when fake is off
    import pyarrow as pa

    from chronon_ray.functions.multimodal import MEDIA_META_TYPE
    webp = pa.table({
        "media_id": ["x"], "payload": pa.array([b"RIFF\x00\x00\x00\x00WEBP"],
                                               type=pa.binary()),
        "meta": pa.array([{"modality": "image", "format": "webp",
                           "width": 1, "height": 1, "sample_rate": 0,
                           "fps": 0.0, "n_bytes": 12}],
                         type=MEDIA_META_TYPE)})
    with pytest.raises(NotImplementedError):
        DecodeImageStage(fake=False)(webp)


def test_multimodal_real_codecs(ray_session):
    """The decode kernels are REAL for uncompressed formats: BMP/PPM round-
    trip bit-exactly, WAV frame energies match a serial RMS, rawvideo frame
    sampling slices the true frames."""
    import pyarrow as pa

    from chronon_ray.functions.multimodal import (
        AudioFrameStage, VideoFrameSampleStage, decode_bmp, decode_ppm,
        decode_wav, encode_bmp, encode_ppm, encode_rawvideo,
        encode_wav_pcm16, resize_nearest, synth_media_table)

    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(pix)), pix)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(pix)), pix)

    x = (0.3 * np.sin(np.arange(2000) / 5.0)).astype(np.float32)
    y, rate = decode_wav(encode_wav_pcm16(x, 8000))
    assert rate == 8000
    np.testing.assert_allclose(y, x, atol=1e-3)

    # decode through the Ray stage: resized real pixels, not a fake
    tbl = synth_media_table(16, modality="image")
    out = ray.data.from_arrow(tbl).map_batches(
        DecodeImageStage(out_h=8, out_w=8), batch_format="pyarrow",
        batch_size=8).to_pandas()
    meta0 = tbl["meta"].to_pylist()[0]
    exp = resize_nearest(decode_bmp(tbl["payload"][0].as_py()), 8, 8)
    np.testing.assert_array_equal(
        np.asarray(out["pixels"].iloc[0]).reshape(8, 8, 3), exp)

    # audio: stage RMS == serial RMS on the same wav
    atbl = synth_media_table(4, modality="audio")
    aout = ray.data.from_arrow(atbl).map_batches(
        AudioFrameStage(n_frames=8), batch_format="pyarrow").to_pandas()
    xs, _ = decode_wav(atbl["payload"][0].as_py())
    edges = (np.arange(9) * len(xs)) // 8
    exp_rms = np.array([np.sqrt(np.mean(xs[a:b].astype(np.float64) ** 2))
                        for a, b in zip(edges[:-1], edges[1:])])
    np.testing.assert_allclose(np.asarray(aout["frame_energy"].iloc[0]),
                               exp_rms, rtol=1e-5)

    # video: sampled frames are true slices of the raw stream
    vtbl = synth_media_table(4, modality="video")
    vout = ray.data.from_arrow(vtbl).map_batches(
        VideoFrameSampleStage(k_frames=3, out_h=12, out_w=16),
        batch_format="pyarrow").to_pandas()
    m0 = vtbl["meta"].to_pylist()[0]
    raw = np.frombuffer(vtbl["payload"][0].as_py(), np.uint8)
    n = len(raw) // (m0["width"] * m0["height"] * 3)
    vid = raw.reshape(n, m0["height"], m0["width"], 3)
    first = vid[0]  # k=3, idx0 = 0
    np.testing.assert_array_equal(
        np.asarray(vout["frames"].iloc[0][0]).reshape(12, 16, 3), first)


def test_tfidf_top_terms(ray_session):
    """TF-IDF edge cases: empty docs drop out, min_df prunes rare terms,
    rank ties break by term ascending."""
    import pandas as pd

    from chronon_ray.functions.text import document_frequency, tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["apple banana apple", "banana cherry", "", "yak zebra"],
    })
    ds = ray.data.from_pandas(docs)
    df_tbl, n = document_frequency(ds)
    assert n == 4
    got_df = dict(zip(df_tbl["term"], df_tbl["df"]))
    assert got_df == {"apple": 1, "banana": 2, "cherry": 1,
                      "yak": 1, "zebra": 1}

    out = tfidf_top_terms(ray.data.from_pandas(docs), k=2).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 4}  # empty doc emits nothing
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    # doc1: apple tf=2 idf=ln(4) beats banana tf=1 idf=ln(2)
    assert list(d1["term"]) == ["apple", "banana"]
    d2 = out[out["doc_id"] == 2].sort_values("rank")
    # cherry idf=ln(4) > banana idf=ln(2), equal tf
    assert list(d2["term"]) == ["cherry", "banana"]
    d4 = out[out["doc_id"] == 4].sort_values("rank")
    # equal tf, equal df -> exact score tie -> term ascending
    assert list(d4["term"]) == ["yak", "zebra"]

    pruned = tfidf_top_terms(ray.data.from_pandas(docs), k=2,
                             min_df=2).to_pandas()
    assert set(pruned["term"]) == {"banana"}


def test_semdedup(ray_session):
    """Planted duplicates collapse to their first id; greedy kept-set
    semantics: a chain a~b, b~c (a !~ c) keeps both ends."""
    from chronon_ray.functions.dedup import semdedup

    rng = np.random.Generator(np.random.PCG64(9))
    base = rng.normal(size=(30, 64)).astype(np.float32)
    dup = base[:8] + rng.normal(scale=0.005, size=(8, 64)).astype(np.float32)
    emb = np.concatenate([base, dup])
    ids = np.arange(len(emb))
    tbl = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(list(emb), type=pa.list_(pa.float32()))})
    out = semdedup(ray.data.from_arrow(tbl), "embedding", "vec_id",
                   threshold=0.98, n_clusters=4).to_pandas() \
        .set_index("vec_id").sort_index()
    assert len(out) == len(emb)  # one decision per vector
    # each planted dup (30+i) is dropped in favor of base i
    for i in range(8):
        assert not out.loc[30 + i, "keep"]
        assert out.loc[30 + i, "dup_of"] == i
    # bases unrelated to each other all kept
    assert out.loc[:29, "keep"].all()

    # greedy chain: b ~ a and c ~ b but c !~ a -> c is KEPT (its only
    # near neighbor b was already dropped)
    a = np.zeros(8, dtype=np.float32); a[0] = 1.0
    rot = np.zeros(8, dtype=np.float32); rot[1] = 1.0
    theta = 0.18  # cos(theta)=0.984 ; cos(2*theta)=0.936 < 0.98
    b = np.cos(theta) * a + np.sin(theta) * rot
    c = np.cos(2 * theta) * a + np.sin(2 * theta) * rot
    tbl2 = pa.table({"vec_id": pa.array([0, 1, 2], type=pa.int64()),
                     "embedding": pa.array([list(a), list(b), list(c)],
                                           type=pa.list_(pa.float32()))})
    out2 = semdedup(ray.data.from_arrow(tbl2), "embedding", "vec_id",
                    threshold=0.98, n_clusters=1).to_pandas() \
        .set_index("vec_id").sort_index()
    assert bool(out2.loc[0, "keep"]) and not bool(out2.loc[1, "keep"])
    assert bool(out2.loc[2, "keep"])  # chain does not cascade


def test_remove_dup_spans_paths_agree(ray_session, sf_dir):
    """Broadcast and fully-shuffled span-removal plans emit identical
    rewrites (cutoff=0 forces the distributed path)."""
    from chronon_ray.functions.dedup import remove_dup_spans

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    cols = ["doc_id", "text", "n_chars_removed"]
    a = remove_dup_spans(docs, "text", "doc_id", L=20).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[cols]
    b = remove_dup_spans(docs, "text", "doc_id", L=20,
                         broadcast_cutoff=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[cols]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (a["n_chars_removed"] > 0).any()  # fixture has real dups


def test_png_codec_roundtrip():
    """Real PNG decode: every filter type inverts exactly; gray stacks to
    RGB; RGBA drops alpha. Gray/RGBA files are built by hand (filter-0 raw
    scanlines + stdlib zlib), independent of encode_png."""
    import struct
    import zlib

    from chronon_ray.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.Generator(np.random.PCG64(2))
    pix = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(pix, filter_type=f)),
                              pix), f"filter {f}"
    g = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[r].tobytes() for r in range(9))
    buf = _PNG_SIG \
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 0)) \
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    assert np.array_equal(decode_png(buf), np.repeat(g[:, :, None], 3, axis=2))
    a = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(7))
    buf = _PNG_SIG \
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 7, 8, 6, 0, 0, 0)) \
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    assert np.array_equal(decode_png(buf), a[:, :, :3])
    with pytest.raises(NotImplementedError):
        decode_png(buf[:8] + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 5, 7, 8, 3, 0, 0, 0)))


def test_jpeg_codec():
    """Baseline JPEG: flat fields near-exact; smooth content round-trips
    at high PSNR across 4:4:4 / 4:2:0 / restart-marker configurations;
    progressive JPEG raises."""
    from chronon_ray.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)

    flat = np.full((24, 40, 3), 130, dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(flat, quality=85))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 1

    yy, xx = np.mgrid[0:50, 0:66]
    grad = np.stack([np.clip(yy * 3, 0, 255), np.clip(xx * 2, 0, 255),
                     np.clip(yy + xx, 0, 255)], axis=2).astype(np.uint8)
    for sub in ("444", "422", "420"):
        for ri in (0, 3):
            out = decode_jpeg_baseline(encode_jpeg_baseline(
                grad, quality=90, subsample=sub, restart_interval=ri))
            assert psnr(grad, out) > 40, (sub, ri)
    # odd dimensions exercise edge-replicated MCU padding
    odd = grad[:49, :63]
    out = decode_jpeg_baseline(encode_jpeg_baseline(odd, quality=90,
                                                    subsample="420"))
    assert out.shape == odd.shape and psnr(odd, out) > 40
    # grayscale single-component scan
    g = np.clip(yy * 4, 0, 255).astype(np.uint8)[:32, :32]
    out = decode_jpeg_baseline(encode_jpeg_baseline(g, quality=90))
    assert psnr(np.repeat(g[:, :, None], 3, axis=2), out) > 40
    # progressive (SOF2) refused, not mis-decoded
    buf = bytearray(encode_jpeg_baseline(flat))
    i = bytes(buf).find(b"\xFF\xC0")
    buf[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline(bytes(buf))


def test_pq_knn_recall(ray_session, sf_dir):
    """PQ/ADC tier: recall vs exact brute force at m=16 subspaces; codes
    are m uint8 per vector (16 B vs 256 B raw)."""
    from chronon_ray.functions.knn import build_pq, pq_knn

    corpus = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = corpus.to_pandas()
    emb = np.stack(pdf["embedding"].to_numpy())
    qm, qids = emb[:10], pdf["vec_id"].to_numpy()[:10]
    books, coded = build_pq(corpus, m=16)
    assert books.shape[0] == 16
    out = pq_knn(coded, books, qids, qm, k=5).to_pandas()
    bf = brute_force_knn(corpus, qids, qm, k=5).to_pandas()
    rec = sum(
        len(set(out[out["query_id"] == q]["neighbor_id"])
            & set(bf[bf["query_id"] == q]["neighbor_id"])) / 5
        for q in qids) / len(qids)
    assert rec >= 0.7, rec


def test_minhash_string_ids(ray_session):
    """The lean LSH path preserves non-integer id types end to end (both
    small-mode and the distributed halves exchange)."""
    from chronon_ray.functions.dedup import minhash_lsh_pairs

    rng = np.random.Generator(np.random.PCG64(6))
    words = ["w" + format(x, "06x") for x in rng.integers(0, 1 << 24, 500)]
    base = " ".join(rng.choice(words, size=60))
    near = base.replace(base.split()[5], "CHANGED", 1)
    tbl = pa.table({
        "doc_id": pa.array(["docA", "docB", "docC"]),
        "text": pa.array([base, near, " ".join(rng.choice(words, 60))]),
    })
    for cutoff in (100_000, 0):  # small mode, then distributed mode
        pairs = minhash_lsh_pairs(ray.data.from_arrow(tbl), "text",
                                  "doc_id", threshold=0.5,
                                  small_mode_cutoff=cutoff).to_pandas()
        assert {(a, b) for a, b in zip(pairs["a"], pairs["b"])} == \
            {("docA", "docB")}, cutoff


def test_profile_table_list_and_timestamp(ray_session, sf_dir):
    """profile_table tolerates list columns (NaN min/max) and reports
    TZ-independent epoch seconds for timestamp columns."""
    from chronon_ray.analyzer import profile_table

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = profile_table(emb).set_index("column")
    assert np.isnan(out.loc["embedding", "min_val"])
    assert out.loc["vec_id", "n_nulls"] == 0
    ts = pd.DataFrame({"t": pd.to_datetime(["2026-01-01", "2026-01-03"])})
    p = profile_table(ray.data.from_pandas(ts)).iloc[0]
    assert p["min_val"] == pd.Timestamp("2026-01-01").timestamp() or \
        p["min_val"] == 1767225600.0  # epoch of 2026-01-01T00:00Z
