"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

No reference analog (named by the task brief as first-class training-data
ops). Each is an actor-pool `map_batches` stage: regexes/profiles compiled
once per actor in __init__, vectorized pandas string kernels per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

#: tiny stopword profiles for a 5-language heuristic (the fixture langs)
_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "eine", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour", "qui", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "que", "en", "un", "una", "por", "para"},
}


class LangIdStage:
    """n-gram/stopword heuristic language ID. CJK detection by codepoint
    ranges; latin languages scored by stopword hit-rate."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàâçñáíóúÄÖÜ]+")
        self.cjk_re = re.compile(r"[一-鿿㐀-䶿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col]
        nn = texts.notna()
        t = texts.fillna("")
        n_cjk = t.str.count(self.cjk_re.pattern)
        n_chars = t.str.len()
        is_zh = (n_cjk >= 3) | ((n_chars > 0)
                                & (n_cjk / np.maximum(n_chars, 1) > 0.05))
        # one explode + one isin per language profile — no per-row loop
        words = t.str.findall(self.word_re.pattern).explode().str.lower()
        n_words = words.groupby(level=0).count() \
            .reindex(t.index, fill_value=0)
        best_score = pd.Series(np.zeros(len(t)), index=t.index)
        best_lang = pd.Series(["unknown"] * len(t), index=t.index)
        for lang, prof in _PROFILES.items():
            hits = words.isin(prof).groupby(level=0).sum() \
                .reindex(t.index, fill_value=0)
            score = hits / n_words.replace(0, 1)
            better = score > best_score
            best_score = best_score.where(~better, score)
            best_lang = best_lang.where(~better, lang)
        preds = best_lang.where(best_score > 0.02, "unknown")
        preds = preds.where(n_words > 0, "unknown")
        preds = preds.where(~is_zh, "zh")
        preds = preds.where(nn, None)
        batch[self.out_col] = preds
        return batch


class QualityScoreStage:
    """Heuristic quality features: length, punctuation/digit/upper ratios,
    stopword ratio, mean word length + a composite [0,1] score (C4/Gopher-
    style published rule-of-thumb filters)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"\w+", re.U)
        self.stop = _PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        texts = batch[self.text_col].fillna("")
        idx = texts.index
        n_chars = texts.str.len().to_numpy()
        # one explode + grouped reductions — no per-row python
        w = texts.str.lower().str.findall(self.word_re.pattern).explode()
        w = w[w.notna()]
        wlen = w.str.len()
        n_words = wlen.groupby(level=0).size().reindex(idx, fill_value=0) \
            .to_numpy()
        wchars = wlen.groupby(level=0).sum().reindex(idx, fill_value=0) \
            .to_numpy()
        hits = w.isin(self.stop).groupby(level=0).sum() \
            .reindex(idx, fill_value=0).to_numpy()
        nz = np.maximum(n_words, 1)
        mean_wlen = pd.Series(np.where(n_words > 0, wchars / nz, 0.0),
                              index=idx)
        stop_ratio = pd.Series(np.where(n_words > 0, hits / nz, 0.0),
                               index=idx)
        punct = texts.str.count(r"[.,;:!?]").to_numpy()
        digits = texts.str.count(r"\d").to_numpy()
        upper = texts.str.count(r"[A-Z]").to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            punct_ratio = np.where(n_chars > 0, punct / np.maximum(n_chars, 1), 0.0)
            digit_ratio = np.where(n_chars > 0, digits / np.maximum(n_chars, 1), 0.0)
            upper_ratio = np.where(n_chars > 0, upper / np.maximum(n_chars, 1), 0.0)
        score = (
            0.25 * np.clip(n_words / 100.0, 0, 1)
            + 0.25 * np.clip(stop_ratio.to_numpy() / 0.3, 0, 1)
            + 0.25 * (1 - np.clip(digit_ratio / 0.2, 0, 1))
            + 0.25 * (1 - np.clip(upper_ratio / 0.3, 0, 1))
        )
        batch["n_words"] = n_words.astype(np.int64)
        batch["mean_word_len"] = mean_wlen.to_numpy(dtype=np.float64)
        batch["stopword_ratio"] = stop_ratio.to_numpy(dtype=np.float64)
        batch["punct_ratio"] = punct_ratio
        batch["digit_ratio"] = digit_ratio
        batch["upper_ratio"] = upper_ratio
        batch["quality_score"] = score
        return batch


#: GPT2-style pre-tokenization pattern (published in the GPT-2 BPE paper/code)
_BPE_ISH = r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+"


class TokenCountStage:
    """Whitespace token count + BPE-ish regex piece count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bpe_re = re.compile(_BPE_ISH)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        # str.count(pattern) == len(findall(pattern)) — vectorized C path
        batch["n_tokens_ws"] = texts.str.count(r"\S+").astype(np.int64)
        batch["n_tokens_bpe"] = texts.str.count(_BPE_ISH).astype(np.int64)
        return batch


#: shared ASCII word pattern — kept in exact parity with the DuckDB oracle
#: (`regexp_extract_all(lower(text), '[a-z0-9]+')`)
_WORD_ASCII = r"[a-z0-9]+"


class RepetitionSignalsStage:
    """Gopher-style repetition filters (Rae et al. 2021, published heuristic
    set): duplicate-line fraction, duplicate-line character fraction, the
    character fraction covered by the most frequent word 2-gram, and the
    within-document duplicate 5-gram fraction.

    Fully vectorized: one explode + groupby per signal family, no per-row
    Python. Every output is an exact integer-ratio computation so a DuckDB
    oracle can reproduce it bit-for-bit (after fixed rounding).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(_WORD_ASCII)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        t = batch[self.text_col].fillna("")
        idx = t.index

        # ---- duplicate lines (non-empty after strip; explicit ASCII
        # whitespace set so the DuckDB oracle's trim() matches exactly)
        lines = t.str.split("\n").explode().str.strip(" \t\r\n\x0b\x0c")
        lines = lines[lines.str.len() > 0]
        lc = lines.groupby([lines.index, lines]).size()
        # per doc: n lines, n distinct, chars in duplicate occurrences
        n_lines = lc.groupby(level=0).sum().reindex(idx, fill_value=0)
        n_dist = lc.groupby(level=0).size().reindex(idx, fill_value=0)
        linelen = lc.index.get_level_values(1).str.len().to_numpy()
        cnt = lc.to_numpy()
        per = pd.DataFrame({
            "dup_chars": (cnt - 1) * linelen,
            "tot_chars": cnt * linelen,
        }, index=lc.index.get_level_values(0))
        agg = per.groupby(level=0).sum().reindex(idx, fill_value=0)
        dup_line_frac = np.where(
            n_lines > 0, (n_lines - n_dist) / np.maximum(n_lines, 1), 0.0)
        dup_line_char_frac = np.where(
            agg["tot_chars"] > 0,
            agg["dup_chars"] / np.maximum(agg["tot_chars"], 1), 0.0)

        # ---- word stream (ASCII lowercased, oracle-parity regex)
        words = t.str.lower().str.findall(self.word_re.pattern).explode()
        words = words[words.notna()]
        wlen = words.str.len()
        tot_word_chars = wlen.groupby(level=0).sum().reindex(idx, fill_value=0)

        # ---- most frequent 2-gram char coverage
        nxt = words.groupby(level=0).shift(-1)
        ok = nxt.notna()
        g2 = words[ok] + " " + nxt[ok]
        g2len = wlen[ok] + nxt[ok].str.len()
        gc = pd.DataFrame({"g": g2, "clen": g2len}) \
            .groupby([g2.index, "g"]).agg(cnt=("clen", "size"),
                                          clen=("clen", "first"))
        if len(gc):
            gc = gc.reset_index(level=1, drop=True)
            gc["cover"] = gc["cnt"] * gc["clen"]
            # top by count, ties by char length (deterministic, SQL order by)
            gc = gc.sort_values(["cnt", "clen"], ascending=False, kind="stable")
            top = gc.groupby(level=0).head(1)["cover"] \
                .reindex(idx, fill_value=0)
        else:
            top = pd.Series(np.zeros(len(idx)), index=idx)
        top_2gram_char_frac = np.where(
            tot_word_chars > 0, top / np.maximum(tot_word_chars, 1), 0.0)

        # ---- within-doc duplicate 5-grams
        parts5 = [words]
        for k in range(1, 5):
            parts5.append(words.groupby(level=0).shift(-k))
        ok5 = pd.concat([p.notna() for p in parts5], axis=1).all(axis=1)
        if ok5.any():
            g5 = parts5[0][ok5]
            for p in parts5[1:]:
                g5 = g5 + " " + p[ok5]
            c5 = g5.groupby([g5.index, g5]).size()
            n5 = c5.groupby(level=0).sum().reindex(idx, fill_value=0)
            d5 = c5.groupby(level=0).size().reindex(idx, fill_value=0)
        else:
            n5 = d5 = pd.Series(np.zeros(len(idx)), index=idx)
        dup_5gram_frac = np.where(n5 > 0, (n5 - d5) / np.maximum(n5, 1), 0.0)

        batch["n_lines"] = n_lines.to_numpy().astype(np.int64)
        batch["dup_line_frac"] = dup_line_frac
        batch["dup_line_char_frac"] = dup_line_char_frac
        batch["top_2gram_char_frac"] = top_2gram_char_frac
        batch["dup_5gram_frac"] = dup_5gram_frac
        return batch


class FingerprintStage:
    """Deterministic 63-bit document fingerprint: Rabin-Karp rolling
    polynomial hash over the whitespace-normalized text."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col, self.out_col = text_col, out_col
        self.ws_re = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(batch), dtype=np.int64)
        texts = batch[self.text_col]
        vals = texts.to_numpy() if hasattr(texts, "to_numpy") else texts
        P = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for i, t in enumerate(vals):
                if t is None:
                    continue
                norm = self.ws_re.sub(" ", t.strip().lower())
                arr = np.frombuffer(norm.encode("utf-8", "ignore"),
                                    dtype=np.uint8).astype(np.uint64)
                if len(arr) == 0:
                    continue
                # H = Σ b_i · P^(n-1-i)  (mod 2^64) — vectorized via cumprod
                pw = np.full(len(arr), P, dtype=np.uint64)
                pw[0] = 1
                pw = np.cumprod(pw)  # P^0..P^(n-1), wrapping mod 2^64
                h = np.uint64((arr * pw[::-1]).sum())
                out[i] = np.int64(h >> np.uint64(1))
        batch[self.out_col] = out
        return batch


# ------------------------------------------------------------- TF-IDF

#: sentinel term carrying the corpus doc count through the DF aggregation,
#: so N and DF come out of ONE streaming pass (no second scan for count()).
_N_DOCS_SENTINEL = "\x00__n_docs__\x00"


class _DfPartial:
    """Per-batch document-frequency partial: (term, df) where df is the
    number of docs IN THIS BATCH containing the term, plus one sentinel row
    with the batch's doc count. Only vocab-sized partials cross the shuffle
    — the (doc, term) explosion never leaves the task."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        toks = texts.str.split()
        lengths = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        if lengths.sum() == 0:
            return pd.DataFrame({
                "term": [_N_DOCS_SENTINEL],
                "df": np.array([len(batch)], dtype=np.int64)})
        flat = np.concatenate(toks.to_numpy())
        doc_idx = np.repeat(np.arange(len(batch)), lengths)
        # distinct (doc, term) pairs, then count docs per term — all C paths
        pairs = pd.DataFrame({"d": doc_idx, "term": flat})
        df = (pairs.drop_duplicates().groupby("term", sort=False)
              .size().reset_index(name="df"))
        df["df"] = df["df"].astype(np.int64)
        sent = pd.DataFrame({"term": [_N_DOCS_SENTINEL],
                             "df": np.array([len(batch)], dtype=np.int64)})
        return pd.concat([df, sent], ignore_index=True)


def document_frequency(docs, text_col: str = "text"):
    """(vocab-sized pandas DF table, corpus doc count N) in one streaming
    pass: per-batch partials → small groupby(term) sum. The result is
    driver-materialized BY DESIGN — document frequency is the canonical
    small side of TF-IDF (vocab ≪ corpus; prune with min_df downstream
    if a pathological corpus breaks that assumption)."""
    part = docs.map_batches(_DfPartial(text_col), batch_format="pandas",
                            batch_size=4096)
    agg = part.groupby("term").sum("df").to_pandas()
    # groupby.sum names the output column sum(df)
    col = "sum(df)" if "sum(df)" in agg.columns else "df"
    agg = agg.rename(columns={col: "df"})
    n_mask = agg["term"] == _N_DOCS_SENTINEL
    n_docs = int(agg.loc[n_mask, "df"].iloc[0])
    return agg.loc[~n_mask].reset_index(drop=True), n_docs


class TfIdfTopK:
    """Per-doc TF-IDF top-k terms against a BROADCAST document-frequency
    table (ray.put once, fetched per actor — never re-shipped per batch).

    Score = tf * ln(N / df); rank ties broken by term ascending, matching
    the SQL oracle's row_number() ordering. Output columns are integer-only
    (tf, df, rank) so the driver's value hash never touches floats."""

    def __init__(self, ref, k: int = 5, min_df: int = 1,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ref, self.k, self.min_df = ref, k, min_df
        self.text_col, self.id_col = text_col, id_col
        self._df = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._df is None:
            import ray
            df_tbl, n_docs = ray.get(self.ref)
            self._df = df_tbl.set_index("term")["df"]
            self._idf = np.log(float(n_docs) / self._df.to_numpy())
            self._idf = pd.Series(self._idf, index=self._df.index)
        texts = batch[self.text_col].fillna("")
        toks = texts.str.split()
        lengths = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=str),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64)})
        if lengths.sum() == 0:
            return empty
        flat = np.concatenate(toks.to_numpy())
        d = np.repeat(batch[self.id_col].to_numpy(), lengths)
        tf = (pd.DataFrame({"doc_id": d, "term": flat})
              .groupby(["doc_id", "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["df"] = tf["term"].map(self._df).fillna(0).astype(np.int64)
        tf = tf[tf["df"] >= self.min_df]
        if not len(tf):
            return empty
        score = tf["tf"].to_numpy() * tf["term"].map(self._idf).to_numpy()
        tf = tf.assign(_neg=-score).sort_values(
            ["doc_id", "_neg", "term"], kind="mergesort")
        tf["rank"] = tf.groupby("doc_id", sort=False).cumcount() + 1
        out = tf[tf["rank"] <= self.k].drop(columns="_neg")
        out["tf"] = out["tf"].astype(np.int64)
        out["rank"] = out["rank"].astype(np.int64)
        return out.reset_index(drop=True)


def tfidf_top_terms(docs, k: int = 5, min_df: int = 1,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Top-k TF-IDF terms per document. Two streaming passes over the
    corpus: (1) vocab-sized DF partials → one small groupby; (2) broadcast
    the DF table (ray.put once) and rank per batch. No (doc, term) pairs
    ever cross a shuffle — the design holds at corpus sizes where exploding
    tokens through an exchange would dominate."""
    import ray

    df_tbl, n_docs = document_frequency(docs, text_col)
    ref = ray.put((df_tbl, n_docs))
    return docs.map_batches(
        TfIdfTopK(ref, k=k, min_df=min_df, text_col=text_col, id_col=id_col),
        batch_format="pandas", batch_size=4096)


# ------------------------------------------- hashed linear classifier


def _poly_hash_word(w: str) -> int:
    """Codepoint polynomial hash mod 2^32 — bit-identical to the DuckDB
    expression list_reduce(list_prepend(0, list_transform(string_split(w,
    ''), c -> ord(c))), (acc, x) -> (acc * 31 + x) % 4294967296)."""
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % 4294967296
    return h


class HashedLinearScorerStage:
    """FastText-style document scorer: a linear model over hashed unigram
    features. The batched-model-inference pattern: the weight function and
    the word→feature cache live in the actor (built in __init__, reused
    across batches); scoring per batch is one explode + map + groupby sum.

    Weights are a deterministic function of the feature index
    (Knuth-multiplicative, centered), so the whole scorer is reproducible
    in SQL — integer outputs only, no float in the contract. Swap
    `_weight` for trained weights (ray.put a weight vector, fetch in
    __init__) to serve a real model with the same plumbing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 dim: int = 1 << 20):
        self.text_col, self.id_col, self.dim = text_col, id_col, dim
        self._cache: dict[str, int] = {}

    def _weight(self, word: str) -> int:
        w = self._cache.get(word)
        if w is None:
            idx = _poly_hash_word(word) % self.dim
            w = (idx * 2654435761) % 4294967296 - 2147483648
            self._cache[word] = w
        return w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        toks = texts.str.split()
        lengths = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_words": pd.Series([], dtype=np.int64),
            "score_int": pd.Series([], dtype=np.int64),
            "label": pd.Series([], dtype=bool)})
        if lengths.sum() == 0:
            return empty
        flat = np.concatenate(toks.to_numpy())
        for w in pd.unique(flat):
            self._weight(w)  # warm the cache once per new word
        wts = pd.Series(flat).map(self._cache).to_numpy(dtype=np.int64)
        d = np.repeat(batch[self.id_col].to_numpy(), lengths)
        out = (pd.DataFrame({"doc_id": d, "wt": wts})
               .groupby("doc_id", sort=False)
               .agg(n_words=("wt", "size"), score_int=("wt", "sum"))
               .reset_index())
        out["n_words"] = out["n_words"].astype(np.int64)
        out["score_int"] = out["score_int"].astype(np.int64)
        out["label"] = out["score_int"] > 0
        return out


def score_documents(docs, text_col: str = "text", id_col: str = "doc_id",
                    dim: int = 1 << 20, concurrency: int | None = None):
    """(doc_id, n_words, score_int, label) per document — actor pool when
    concurrency is given (cache persists across batches), plain tasks
    otherwise."""
    kw = dict(text_col=text_col, id_col=id_col, dim=dim)
    if concurrency:
        # autoscaling pool (min 1): a fixed pool equal to the CPU count
        # deadlocks the upstream read on small clusters
        return docs.map_batches(HashedLinearScorerStage,
                                fn_constructor_kwargs=kw,
                                batch_format="pandas",
                                concurrency=(1, concurrency))
    return docs.map_batches(HashedLinearScorerStage(**kw),
                            batch_format="pandas")


# ------------------------------------------------------------- chunking


def chunk_documents(docs, chunk_chars: int = 512, stride: int = 384,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Sliding-window document chunking (RAG / context-window prep): each
    doc becomes ceil((max(n-C,0))/S)+1 chunks of up to `chunk_chars` chars
    starting every `stride` chars (stride ≤ chunk ⇒ full coverage with
    overlap). Zero-shuffle streaming map; offsets are CHARACTER-based so
    the SQL oracle's substr() reproduces chunks exactly.

    Output: (id, chunk_idx, start, end, chunk). Empty docs emit nothing."""
    assert 0 < stride <= chunk_chars

    def chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        texts = pdf[text_col].fillna("")
        n = texts.str.len().to_numpy(dtype=np.int64)
        counts = np.where(
            n == 0, 0,
            (np.maximum(n - chunk_chars, 0) + stride - 1) // stride + 1)
        doc_idx = np.repeat(np.arange(len(pdf)), counts)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ci = np.arange(int(counts.sum()), dtype=np.int64) - cum[doc_idx]
        start = ci * stride
        end = np.minimum(start + chunk_chars, n[doc_idx])
        vals = texts.to_numpy()
        chunks = [vals[d][s:e] for d, s, e in zip(doc_idx, start, end)]
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy()[doc_idx],
            "chunk_idx": ci,
            "start": start.astype(np.int64),
            "end": end.astype(np.int64),
            "chunk": chunks,
        })

    chunk.__name__ = "chunk_documents"
    return docs.map_batches(chunk, batch_format="pandas")


# ------------------------------------------------- LM perplexity scoring


class _BigramCountPartial:
    """Per-batch partial unigram/bigram counts (vocab-sized rows through
    the shuffle, never the token stream). Rows: (w1, w2, cnt) for bigrams
    and (w1, '', cnt) for unigrams; one sentinel ('', '', total_tokens)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        texts = pdf[self.text_col].fillna("")
        toks = texts.str.split()
        lengths = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        empty = pd.DataFrame({"w1": pd.Series(dtype=str),
                              "w2": pd.Series(dtype=str),
                              "cnt": pd.Series(dtype=np.int64)})
        if lengths.sum() == 0:
            return empty
        flat = np.concatenate(toks.to_numpy())
        doc_idx = np.repeat(np.arange(len(pdf)), lengths)
        uni = (pd.DataFrame({"w1": flat})
               .groupby("w1", sort=False).size().reset_index(name="cnt"))
        uni["w2"] = ""
        # bigrams within a doc: adjacent positions with same doc index
        same = doc_idx[1:] == doc_idx[:-1]
        bi = (pd.DataFrame({"w1": flat[:-1][same], "w2": flat[1:][same]})
              .groupby(["w1", "w2"], sort=False).size()
              .reset_index(name="cnt"))
        out = pd.concat([uni[["w1", "w2", "cnt"]], bi], ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out


def bigram_lm_counts(docs, text_col: str = "text", min_count: int = 1):
    """(unigram counts frame, bigram counts frame, vocab size) from a
    streaming pass — the corpus-LM side of CCNet-style perplexity
    filtering. The distinct-bigram table is driver-materialized; at corpus
    scale it grows superlinearly, so pass ``min_count`` > 1 to prune rare
    bigrams BEFORE broadcast (standard LM pruning — pruned bigrams score
    as unseen, exactly like KenLM prune). Unigrams/vocab are never
    pruned, so smoothing denominators are exact."""
    part = docs.map_batches(_BigramCountPartial(text_col),
                            batch_format="pandas", batch_size=4096)
    agg = part.groupby(["w1", "w2"]).sum("cnt").to_pandas()
    col = "sum(cnt)" if "sum(cnt)" in agg.columns else "cnt"
    agg = agg.rename(columns={col: "cnt"})
    uni = agg[agg["w2"] == ""][["w1", "cnt"]]
    bi = agg[agg["w2"] != ""]
    if min_count > 1:
        bi = bi[bi["cnt"] >= min_count]
    vocab = int(len(uni))
    return uni, bi, vocab


class PerplexityStage:
    """Per-doc mean negative log-likelihood under the corpus bigram LM with
    Laplace smoothing: nll(w1 w2 ... wn) = -1/(n-1) Σ ln((c(wi,wi+1)+1) /
    (c(wi)+V)). Counts broadcast once via ray.put; scoring is one explode +
    two hashtable maps per batch."""

    def __init__(self, ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.ref, self.text_col, self.id_col = ref, text_col, id_col
        self._t = None

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if self._t is None:
            import ray
            uni, bi, vocab = ray.get(self.ref)
            self._uni = uni.set_index("w1")["cnt"]
            self._bi = bi.set_index(["w1", "w2"])["cnt"]
            self._v = float(vocab)
        texts = pdf[self.text_col].fillna("")
        toks = texts.str.split()
        lengths = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        empty = pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "n_bigrams": pd.Series(dtype=np.int64),
            "avg_nll": pd.Series(dtype=np.float64)})
        if lengths.sum() == 0:
            return empty
        flat = np.concatenate(toks.to_numpy())
        d = np.repeat(pdf[self.id_col].to_numpy(), lengths)
        same = d[1:] == d[:-1]
        w1, w2, dd = flat[:-1][same], flat[1:][same], d[:-1][same]
        if not len(w1):
            return empty
        c_bi = pd.MultiIndex.from_arrays([w1, w2]).map(self._bi) \
            .to_numpy(dtype=np.float64, na_value=0.0)
        c_un = pd.Series(w1).map(self._uni) \
            .to_numpy(dtype=np.float64, na_value=0.0)
        nll = -np.log((c_bi + 1.0) / (c_un + self._v))
        out = (pd.DataFrame({"doc_id": dd, "nll": nll})
               .groupby("doc_id", sort=False)
               .agg(n_bigrams=("nll", "size"), avg_nll=("nll", "mean"))
               .reset_index())
        out["n_bigrams"] = out["n_bigrams"].astype(np.int64)
        return out


def perplexity_score(docs, text_col: str = "text", id_col: str = "doc_id",
                     min_count: int = 1):
    """(doc_id, n_bigrams, avg_nll) per doc under the corpus bigram LM —
    two streaming passes (counts, then broadcast scoring); docs with < 2
    tokens emit nothing. ``min_count`` prunes the broadcast bigram table
    at corpus scale (see bigram_lm_counts)."""
    import ray

    uni, bi, vocab = bigram_lm_counts(docs, text_col, min_count=min_count)
    ref = ray.put((uni, bi, vocab))
    return docs.map_batches(
        PerplexityStage(ref, text_col=text_col, id_col=id_col),
        batch_format="pandas", batch_size=4096)
