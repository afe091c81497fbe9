"""Exact byte-pair-encoding (BPE) tokenization as engine-native column
expressions (VERDICT r7 item 5 — replaces counting-by-pre-tokenizer with
a real merges-table encode).

Algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016). Training learns a ranked list of
symbol-pair merges; encoding applies the merges to each pre-token IN
LEARNED RANK ORDER, one left-to-right non-overlapping pass per merge.
Rank-order application is exact — merging pair r can only ever CREATE
pairs of rank > r, because the merged symbol did not exist as a unit
before merge r was learned, so a single ordered sweep reaches the same
fixpoint as the priority-queue encoder GPT-2 uses.

The engine trick: represent a document as its pre-tokens' symbols, each
symbol wrapped in sentinel brackets and pre-tokens joined by a separator
("⟨h⟩⟨e⟩⟨l⟩⟨l⟩⟨o⟩¦⟨ ⟩⟨w⟩..."), and apply each merge as ONE plain
``replace`` call: ``replace(s, '⟨a⟩⟨b⟩', '⟨ab⟩')``. ``replace`` scans
left to right and substitutes non-overlapping occurrences — exactly the
single-merge BPE pass ("⟨l⟩⟨l⟩⟨l⟩" -> "⟨ll⟩⟨l⟩", leftmost wins) — and
has IDENTICAL semantics in Spark (``F.replace``) and DuckDB
(``replace``), so the whole encode is a fold of R builtin calls: no UDF,
whole-stage codegen on the Spark side, and a value-exact DuckDB oracle
generated from the same merges table. Merges never span pre-token
boundaries because the separator breaks the bracket pattern. Cost is
O(R · doc_len) vectorized character scanning per document — a pure
projection, zero shuffle at any corpus size.

Sentinels are printable-but-stripped: the three characters ⟨ ⟩ ¦ are
removed from the input before tokenization (the module's ONE documented
text contract — mathematical angle brackets and broken bar carry no
prose content; a corpus where they do needs different sentinels). This
keeps the generated SQL readable and avoids control-character literals
that SQL strings cannot carry portably.

The default merges table is trained (deterministically: max count, ties
to the lexicographically smallest pair) from a small built-in seed
corpus at first use — a self-contained demo vocabulary. Production
callers pass their own ``merges`` list loaded from a real tokenizer's
merges file; every function takes it as an argument.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.text import BPE_ISH_REGEX

#: Symbol wrappers and pre-token separator. Stripped from input text
#: before tokenization so they can never collide with content.
OPEN = "⟨"   # ⟨ mathematical left angle bracket
CLOSE = "⟩"  # ⟩ mathematical right angle bracket
SEP = "¦"    # ¦ broken bar: pre-token boundary, merges never span it

_STRIP_CLASS = f"[{OPEN}{CLOSE}{SEP}]"

DEFAULT_NUM_MERGES = 128

#: Seed corpus for the built-in demo vocabulary — ordinary English prose
#: with enough repetition that the learned merges look like a real
#: tokenizer's head (the/ing/ion/and, leading-space variants).
SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog while the other dogs "
    "are sleeping in the warm afternoon sunshine near the old barn",
    "training data pipelines keep cleaning and deduplicating documents "
    "before the model ever sees a single training token of the corpus",
    "the engine applies the learned merges in order and the resulting "
    "tokens match the reference implementation byte for byte every time",
    "information about the distribution of words and their endings like "
    "running jumping thinking and understanding helps the tokenizer",
    "a good tokenizer compresses common words into single tokens and "
    "splits rare words into smaller meaningful subword units instead",
    "numbers like 1234 and 2026 and punctuation marks like commas, "
    "periods. and question marks? are handled as separate token runs",
)

# Python twin of text.BPE_ISH_REGEX (" ?\\p{L}+| ?\\p{N}+|
# " ?[^\\s\\p{L}\\p{N}]+"): letters = [^\W\d_], digits = \d, punct =
# everything else non-space INCLUDING underscore. Exact for text without
# exotic numerics (Nl/No) or combining marks — the trainer's seed corpus
# and the parity fixtures stay inside that subset; the ENGINE pair
# (Spark/DuckDB \p{L}) has its own established parity.
_PRETOK_RE = re.compile(r" ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+")


def _strip_sentinels_py(text: str) -> str:
    return text.replace(OPEN, "").replace(CLOSE, "").replace(SEP, "")


def pretokens_py(text: str) -> list[str]:
    """Pre-tokens of ``text`` (Python twin of the engine pre-tokenizer)."""
    return _PRETOK_RE.findall(_strip_sentinels_py(text))


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """One BPE pass: merge left-to-right non-overlapping occurrences."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    texts: list[str] | tuple[str, ...],
    num_merges: int = DEFAULT_NUM_MERGES,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn a ranked merges table (Sennrich training, fully
    deterministic: highest pair count wins, ties break to the
    lexicographically smallest pair). Pure Python on a bounded corpus —
    training is a driver-side bounded-artifact computation like PQ
    codebooks; the DISTRIBUTED piece is the encode, which is where the
    100 TB cost lives."""
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for tok in pretokens_py(t):
            words[tuple(tok)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, cnt in words.items():
            for p in zip(word, word[1:]):
                pairs[p] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        pair = best[0]
        merges.append(pair)
        words = Counter(
            {_merge_word(w, pair): c for w, c in words.items()}
        )
    return merges


@lru_cache(maxsize=1)
def default_merges() -> tuple[tuple[str, str], ...]:
    """The built-in demo vocabulary (trained once per process, cached;
    deterministic, so every process — and the DuckDB oracle generator —
    sees the identical table)."""
    return tuple(train_bpe_merges(SEED_CORPUS))


def bpe_encode_py(
    text: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Reference encoder (pure Python): rank-order merge sweep per
    pre-token. The pytest parity fixture the engine expressions are
    pinned against."""
    ms = list(merges) if merges is not None else list(default_merges())
    out: list[str] = []
    for tok in pretokens_py(text):
        word = tuple(tok)
        for pair in ms:
            if len(word) == 1:
                break
            word = _merge_word(word, pair)
        out.extend(word)
    return out


def _wrap(sym: str) -> str:
    return OPEN + sym + CLOSE


def bpe_wrapped(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """The encoded document in wrapped-symbol form — the shared core of
    the token/count expressions. One regex pass strips sentinels, one
    extracts pre-tokens, one wraps every character, then R builtin
    ``replace`` calls apply the merges in rank order."""
    c = F.col(col) if isinstance(col, str) else col
    ms = list(merges) if merges is not None else list(default_merges())
    toks = F.regexp_extract_all(
        F.regexp_replace(c, _STRIP_CLASS, ""), F.lit(BPE_ISH_REGEX), 0
    )
    s = F.regexp_replace(
        F.array_join(toks, SEP), f"([^{SEP}])", OPEN + "$1" + CLOSE
    )
    for a, b in ms:
        s = F.replace(s, F.lit(_wrap(a) + _wrap(b)), F.lit(_wrap(a + b)))
    return s


def bpe_tokens_exact(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """array<string> of the document's exact BPE tokens."""
    return F.regexp_extract_all(
        bpe_wrapped(col, merges), F.lit(f"{OPEN}([^{CLOSE}]+){CLOSE}"), 1
    )


def bpe_token_count_exact(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """Exact BPE token count: the number of CLOSE sentinels left after
    the merge fold (counted by length difference — no second tokenizer
    pass). NULL text stays NULL; empty text counts 0."""
    s = bpe_wrapped(col, merges)
    return (
        F.length(s) - F.length(F.replace(s, F.lit(CLOSE), F.lit("")))
    ).cast("long")


# ---------------------------------------------------------------------------
# DuckDB twins (oracle SQL generators)
# ---------------------------------------------------------------------------

#: DuckDB spelling of text.BPE_ISH_REGEX. Single braces on purpose: the
#: generator functions below return fully-evaluated SQL strings that
#: callers interpolate as-is — nothing ``.format()``s the result, so the
#: ``\p{L}`` braces are safe (they would need doubling only if a caller
#: templated the RETURNED string, which none does).
_SQL_PRETOK = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_wrapped_sql(
    expr: str, merges: list[tuple[str, str]] | None = None
) -> str:
    """DuckDB expression producing the identical wrapped-symbol string
    as :func:`bpe_wrapped` over the SQL expression ``expr``."""
    ms = list(merges) if merges is not None else list(default_merges())
    # the CASE keeps NULL text NULL while an EMPTY token list (DuckDB's
    # array_to_string([]) is NULL, Spark's array_join([]) is '') becomes
    # '' — matching Spark's null-in/empty-in contract exactly
    joined = (
        f"(CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"coalesce(array_to_string(regexp_extract_all("
        f"regexp_replace({expr}, '{_STRIP_CLASS}', '', 'g'), "
        f"'{_SQL_PRETOK}'), '{SEP}'), '') END)"
    )
    s = f"regexp_replace({joined}, '([^{SEP}])', '{OPEN}\\1{CLOSE}', 'g')"
    for a, b in ms:
        s = (
            f"replace({s}, {_sql_quote(_wrap(a) + _wrap(b))}, "
            f"{_sql_quote(_wrap(a + b))})"
        )
    return s


def bpe_count_sql(
    expr: str, merges: list[tuple[str, str]] | None = None
) -> str:
    """DuckDB expression for the exact BPE token count of ``expr`` —
    the oracle twin of :func:`bpe_token_count_exact`. The wrapped
    string is built once in a lateral alias by callers that also need
    tokens; standalone use recomputes it (DuckDB CSEs the tree)."""
    s = bpe_wrapped_sql(expr, merges)
    return (
        f"(length({s}) - length(replace({s}, '{CLOSE}', '')))::BIGINT"
    )


def bpe_tokens_sql(
    expr: str, merges: list[tuple[str, str]] | None = None
) -> str:
    """DuckDB expression for the exact BPE token list of ``expr``."""
    s = bpe_wrapped_sql(expr, merges)
    return f"regexp_extract_all({s}, '{OPEN}([^{CLOSE}]+){CLOSE}', 1)"
