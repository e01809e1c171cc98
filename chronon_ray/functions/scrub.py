"""PII scrubbing: vectorized regex redaction of emails / IPv4s / phone-like
digit runs (the standard pre-training privacy pass; no reference analog,
named by the task brief's training-data family).

Zero-shuffle: one stateful `map_batches` stage (patterns compiled once per
actor in ``__init__``), pandas ``.str`` kernels per batch. Patterns are
deliberately restricted to the regex subset where Python ``re`` (ASCII mode)
and DuckDB's RE2 agree exactly — no lookaround, no backrefs, no unicode
classes — so a SQL oracle reproduces every replacement bit-for-bit.

Counting happens on the progressively-scrubbed text in a fixed order
(emails → IPv4 → phones) so a digit run inside an already-redacted email is
not double-counted; the oracle nests its ``regexp_replace`` the same way.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# (name, pattern, replacement) — order matters and is part of the contract
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"),
)


class PIIScrubStage:
    """map_batches(…, batch_format="pandas"): adds ``{text_col}_scrubbed``
    plus per-category match counts ``n_email, n_ipv4, n_phone``."""

    def __init__(self, text_col: str = "text"):
        self.__name__ = type(self).__name__
        self.text_col = text_col
        self.pats = [(name, re.compile(pat, re.ASCII), repl)
                     for name, pat, repl in PII_PATTERNS]

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[self.text_col].fillna("")
        out = pdf.copy()
        for name, pat, repl in self.pats:
            out[f"n_{name}"] = t.str.count(pat).astype(np.int64)
            t = t.str.replace(pat, repl, regex=True)
        out[f"{self.text_col}_scrubbed"] = t
        return out


def scrub_oracle_sql(text_expr: str) -> tuple[str, dict[str, str]]:
    """(scrubbed_sql_expr, {count_col: count_sql_expr}) mirroring
    PIIScrubStage for DuckDB — counts on the progressively-scrubbed text."""
    cur = text_expr
    counts: dict[str, str] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = (
            f"cast(len(regexp_extract_all({cur}, '{pat}')) as bigint)")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return cur, counts
