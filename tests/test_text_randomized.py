"""Randomized differential suite for the text-analysis family.

Every engine stage is compared against an INDEPENDENT slow per-row Python
oracle (Counters and explicit loops — a different code shape from the
engine's vectorized explode/groupby paths) on adversarial random corpora:
empty docs, None docs, whitespace-only docs, CJK, punctuation floods,
repeated lines / 5-grams, digit and uppercase floods, random block layouts.
"""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

_VOCAB = (["the", "and", "is", "of", "to", "in", "that", "it"]  # en stopwords
          + ["alpha", "beta", "gamma", "delta", "x1", "42", "zz9"]
          + ["Foo", "BAR", "MiXeD"])
_LINES = ["dup line one", "dup line one", "unique %d", "  padded line  ",
          "tail"]


def _rand_doc(rng) -> str | None:
    r = rng.random()
    if r < 0.05:
        return None
    if r < 0.10:
        return ""
    if r < 0.14:
        return "  \t\n  "
    if r < 0.18:
        return "这是一个中文测试文档看看语言识别"
    if r < 0.22:
        return "!!! ??? ... ,,, ;;; :::"
    words = [str(_VOCAB[rng.integers(0, len(_VOCAB))])
             for _ in range(int(rng.integers(1, 60)))]
    if rng.random() < 0.3:  # force duplicate 5-grams
        words = words + words[: min(len(words), 12)]
    text = " ".join(words)
    if rng.random() < 0.3:  # multi-line with duplicate lines
        lines = []
        for _ in range(int(rng.integers(2, 7))):
            pick = _LINES[rng.integers(0, len(_LINES))]
            lines.append(pick % rng.integers(0, 5) if "%d" in pick else pick)
        text = text + "\n" + "\n".join(lines)
    if rng.random() < 0.15:
        text = text.upper()
    if rng.random() < 0.15:
        text = text + " 123 456 7890"
    return text


def _corpus(rng, n=150) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [_rand_doc(rng) for _ in range(n)],
    })


def _to_ds(df, rng, n_blocks=4):
    t = pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()),
                  "text": pa.array(df["text"].tolist(), type=pa.string())})
    n = t.num_rows
    cuts = np.sort(rng.choice(np.arange(1, n), size=n_blocks - 1,
                              replace=False))
    ds = None
    for idx in np.split(np.arange(n), cuts):
        x = rd.from_arrow(t.take(pa.array(idx)))
        ds = x if ds is None else ds.union(x)
    return ds


@pytest.mark.parametrize("seed", [301, 302])
def test_tfidf_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import tfidf_top_terms

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    k = int(rng.integers(1, 6))
    min_df = int(rng.integers(1, 3))
    out = tfidf_top_terms(_to_ds(df, rng), k=k, min_df=min_df) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)

    # oracle: Counters + explicit sort
    n_docs = len(df)
    dfreq: Counter = Counter()
    for t in df["text"]:
        dfreq.update(set((t or "").split()))
    rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        tf = Counter((t or "").split())
        cand = [(term, c, dfreq[term]) for term, c in tf.items()
                if dfreq[term] >= min_df]
        cand.sort(key=lambda x: (-(x[1] * np.log(float(n_docs) / x[2])),
                                 x[0]))
        for r, (term, c, d_) in enumerate(cand[:k], 1):
            rows.append((did, term, c, d_, r))
    exp = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df", "rank"]) \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert len(out) == len(exp), (seed, len(out), len(exp))
    for c in ["doc_id", "term", "tf", "df", "rank"]:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")


@pytest.mark.parametrize("seed", [311, 312])
def test_perplexity_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import perplexity_score

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    min_count = int(rng.integers(1, 3))
    out = perplexity_score(_to_ds(df, rng), min_count=min_count) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in df["text"]:
        toks = (t or "").split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    if min_count > 1:
        bi = Counter({g: c for g, c in bi.items() if c >= min_count})
    V = float(len(uni))
    rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        toks = (t or "").split()
        if len(toks) < 2:
            continue
        nll = [-math.log((bi.get((a, b), 0) + 1.0) / (uni[a] + V))
               for a, b in zip(toks, toks[1:])]
        rows.append((did, len(nll), float(np.mean(nll))))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "avg_nll"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(exp), (seed, len(out), len(exp))
    np.testing.assert_array_equal(out["doc_id"], exp["doc_id"])
    np.testing.assert_array_equal(out["n_bigrams"], exp["n_bigrams"])
    np.testing.assert_allclose(out["avg_nll"], exp["avg_nll"], rtol=1e-12)


@pytest.mark.parametrize("seed", [321])
def test_classifier_score_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import score_documents

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    dim = 1 << 16
    out = score_documents(_to_ds(df, rng), dim=dim, concurrency=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def wt(word: str) -> int:
        h = 0
        for ch in word:
            h = (h * 31 + ord(ch)) % 4294967296
        return ((h % dim) * 2654435761) % 4294967296 - 2147483648

    rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        toks = (t or "").split()
        if not toks:
            continue
        s = sum(wt(w) for w in toks)
        rows.append((did, len(toks), s, s > 0))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_words", "score_int",
                                      "label"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(exp), (seed, len(out), len(exp))
    for c in exp.columns:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")


@pytest.mark.parametrize("seed", [331, 332])
def test_repetition_signals_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import RepetitionSignalsStage

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    out = _to_ds(df, rng).map_batches(RepetitionSignalsStage(),
                                      batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    word_re = re.compile(r"[a-z0-9]+")
    exp_rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        t = t or ""
        lines = [ln.strip(" \t\r\n\x0b\x0c") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln]
        lc = Counter(lines)
        n_lines, n_dist = len(lines), len(lc)
        dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
        tot_chars = sum(c * len(ln) for ln, c in lc.items())
        dlf = (n_lines - n_dist) / n_lines if n_lines else 0.0
        dlcf = dup_chars / tot_chars if tot_chars else 0.0

        words = word_re.findall(t.lower())
        twc = sum(len(w) for w in words)
        g2 = Counter()
        for a, b in zip(words, words[1:]):
            g2[(a, b)] += 1
        if g2:
            best = max(g2.items(),
                       key=lambda kv: (kv[1], len(kv[0][0]) + len(kv[0][1])))
            cover = best[1] * (len(best[0][0]) + len(best[0][1]))
        else:
            cover = 0
        t2f = cover / twc if twc else 0.0

        g5 = Counter(tuple(words[i:i + 5])
                     for i in range(len(words) - 4)) if len(words) >= 5 \
            else Counter()
        n5, d5 = sum(g5.values()), len(g5)
        d5f = (n5 - d5) / n5 if n5 else 0.0
        exp_rows.append((did, n_lines, dlf, dlcf, t2f, d5f))

    exp = pd.DataFrame(exp_rows, columns=[
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "dup_5gram_frac"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["n_lines"], exp["n_lines"])
    for c in ["dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
              "dup_5gram_frac"]:
        np.testing.assert_allclose(out[c].to_numpy(), exp[c].to_numpy(),
                                   rtol=1e-12, err_msg=f"{seed}:{c}")


@pytest.mark.parametrize("seed", [341])
def test_chunk_documents_exact_and_coverage(ray_session, seed):
    from chronon_ray.functions.text import chunk_documents

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    C = int(rng.integers(8, 40))
    S = int(rng.integers(4, C + 1))
    out = chunk_documents(_to_ds(df, rng), chunk_chars=C, stride=S) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)

    rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        t = t or ""
        n = len(t)
        cnt = 0 if n == 0 else (max(n - C, 0) + S - 1) // S + 1
        for i in range(cnt):
            s = i * S
            e = min(s + C, n)
            rows.append((did, i, s, e, t[s:e]))
    exp = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "start", "end",
                                      "chunk"]) \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(out) == len(exp), (seed, C, S, len(out), len(exp))
    for c in exp.columns:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")
    # coverage: chunks reassemble the full text
    for did, grp in exp.groupby("doc_id"):
        t = df.loc[df["doc_id"] == did, "text"].iloc[0] or ""
        if not len(grp):
            assert t == ""
            continue
        rebuilt = "".join(
            row.chunk[: S] if i < len(grp) - 1 else row.chunk
            for i, row in enumerate(grp.itertuples()))
        assert rebuilt == t, did


@pytest.mark.parametrize("seed", [351])
def test_quality_score_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import QualityScoreStage, _PROFILES

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    out = _to_ds(df, rng).map_batches(QualityScoreStage(),
                                      batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    wre = re.compile(r"\w+", re.U)
    stop = _PROFILES["en"]
    rows = []
    for did, t in zip(df["doc_id"], df["text"]):
        t = t or ""
        nch = len(t)
        words = wre.findall(t.lower())
        nw = len(words)
        mean_wlen = sum(map(len, words)) / nw if nw else 0.0
        sr = sum(w in stop for w in words) / nw if nw else 0.0
        pr = len(re.findall(r"[.,;:!?]", t)) / nch if nch else 0.0
        dr = len(re.findall(r"\d", t)) / nch if nch else 0.0
        ur = len(re.findall(r"[A-Z]", t)) / nch if nch else 0.0
        score = (0.25 * min(nw / 100.0, 1) + 0.25 * min(sr / 0.3, 1)
                 + 0.25 * (1 - min(dr / 0.2, 1))
                 + 0.25 * (1 - min(ur / 0.3, 1)))
        rows.append((did, nw, mean_wlen, sr, pr, dr, ur, score))
    exp = pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "mean_word_len", "stopword_ratio",
        "punct_ratio", "digit_ratio", "upper_ratio", "quality_score"]) \
        .sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(out["n_words"], exp["n_words"])
    for c in ["mean_word_len", "stopword_ratio", "punct_ratio",
              "digit_ratio", "upper_ratio", "quality_score"]:
        np.testing.assert_allclose(out[c].to_numpy(), exp[c].to_numpy(),
                                   rtol=1e-12, err_msg=f"{seed}:{c}")


@pytest.mark.parametrize("seed", [361])
def test_token_counts_vs_python_oracle(ray_session, seed):
    from chronon_ray.functions.text import TokenCountStage, _BPE_ISH

    rng = np.random.default_rng(seed)
    df = _corpus(rng)
    out = _to_ds(df, rng).map_batches(TokenCountStage(),
                                      batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    bpe = re.compile(_BPE_ISH)
    exp_ws = [len((t or "").split()) for t in df["text"]]
    exp_bpe = [len(bpe.findall(t or "")) for t in df["text"]]
    np.testing.assert_array_equal(out["n_tokens_ws"].to_numpy(), exp_ws)
    np.testing.assert_array_equal(out["n_tokens_bpe"].to_numpy(), exp_bpe)


def test_langid_invariants(ray_session):
    from chronon_ray.functions.text import LangIdStage

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [None, "", "这是一个中文测试文档",
                 "the cat is in the house and it is warm",
                 "der hund ist nicht mit der katze und das ist gut",
                 "xqz vbn mmm kkk"],
    })
    t = pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()),
                  "text": pa.array(df["text"].tolist(), type=pa.string())})
    out = rd.from_arrow(t).map_batches(LangIdStage(),
                                       batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = out["lang_pred"].tolist()
    assert got[0] is None
    assert got[1] == "unknown"
    assert got[2] == "zh"
    assert got[3] == "en"
    assert got[4] == "de"
    assert got[5] == "unknown"
