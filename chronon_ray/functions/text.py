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
        texts = batch[self.text_col].fillna("")
        n_chars = texts.str.len().to_numpy()
        words = texts.map(lambda t: self.word_re.findall(t.lower()))
        n_words = words.map(len).to_numpy()
        mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        stop_ratio = words.map(
            lambda ws: sum(w in self.stop for w in ws) / len(ws) if ws else 0.0)
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
        batch["n_tokens_ws"] = texts.str.split().map(len).astype(np.int64)
        batch["n_tokens_bpe"] = texts.map(
            lambda t: len(self.bpe_re.findall(t))).astype(np.int64)
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
