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

import random
import re
from functools import lru_cache

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from s3_access_logs_spark.functions.text import BPE_ISH_REGEX
from s3_access_logs_spark.functions.unicode_classes import (
    L_CLASS as _UC_L,
)
from s3_access_logs_spark.functions.unicode_classes import (
    N_CLASS as _UC_N,
)

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
# " ?[^\\s\\p{L}\\p{N}]+"), EXACT (review r9): Python re has no \p{...},
# and the previous \w-based approximation diverged from the engine on
# No/Nl numerics ('x²': engine splits x|², \w kept x² together) and on
# combining marks / non-ASCII whitespace — which would have made the
# fold and arrow implementations disagree on such text, since the arrow
# path pre-tokenizes in Python. The vendored L_CLASS/N_CLASS range
# tables ARE \p{L}/\p{N} (general categories L*/N*), and Java's \s is
# spelled out literally (ASCII-only — Python's \s is unicode-aware, so
# e.g. NBSP must stay in the PUNCT class exactly as the engine has it).
_JAVA_WS = " \t\n\x0b\f\r"
_PRETOK_RE = re.compile(
    f" ?[{_UC_L}]+| ?[{_UC_N}]+| ?[^{_JAVA_WS}{_UC_L}{_UC_N}]+"
)


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


def _check_sentinel_free(merges: list[tuple[str, str]]) -> None:
    """The fold encoding brackets every symbol in OPEN/CLOSE and joins
    pre-tokens with SEP — a merge SYMBOL containing one of those three
    characters would corrupt the wrapped string silently. Input TEXT is
    already stripped; this guards the table itself (e.g. a merges.txt
    for a corpus that legitimately tokenizes ⟨ ⟩ ¦)."""
    for a, b in merges:
        for part in (a, b):
            if OPEN in part or CLOSE in part or SEP in part:
                raise ValueError(
                    f"bpe: merge symbol {part!r} contains a sentinel "
                    f"character ({OPEN} {CLOSE} {SEP}) — the replace-fold "
                    "encoding cannot represent it. Note the module-wide "
                    "text contract strips these three characters from "
                    "INPUT on every path (fold and arrow alike), so such "
                    "a merge could never fire anyway; a corpus where "
                    "they carry content needs different sentinels"
                )


def bpe_wrapped(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """The encoded document in wrapped-symbol form — the shared core of
    the token/count expressions. One regex pass strips sentinels, one
    extracts pre-tokens, one wraps every character, then R builtin
    ``replace`` calls apply the merges in rank order."""
    c = F.col(col) if isinstance(col, str) else col
    ms = list(merges) if merges is not None else list(default_merges())
    _check_sentinel_free(ms)
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
    as :func:`bpe_wrapped` over the SQL expression ``expr``.

    Oracle-side depth note: DuckDB's binder rejects expressions deeper
    than ~128 nested calls — the oracle analogue of the Spark fold's
    stack cliff, and in DuckDB 1.0.0 it is effectively HARD (the
    ``max_expression_depth`` setting exists but does not lift this
    binder recursion check). Tables past ~120 merges are therefore not
    oracle-replayable at all; the arrow path carries them, pinned by
    pytest equality against ``bpe_encode_py`` instead of a DuckDB twin.
    The demo vocabulary (~91) fits comfortably, which is what keeps the
    ``bpe_exact_tokens`` catalog oracle runnable by the driver's
    unconfigured DuckDB."""
    ms = list(merges) if merges is not None else list(default_merges())
    _check_sentinel_free(ms)
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


# ---------------------------------------------------------------------------
# Production vocabularies (VERDICT r8 items 1 + 3)
#
# The replace-fold above nests ONE Catalyst expression per merge: exact
# and whole-stage-codegen-fast at demo scale, but expression-tree depth
# grows with the merge count, and a real tokenizer ships ~50k merges.
# Measured on this tree (tools/bpe_scale.py, table in BASELINE.md): the
# fold dies outright — a JVM StackOverflowError in the column-node →
# Catalyst expression conversion at ~320 nested replaces — so a 50k
# tree is unusable. The arrow path below is the same algorithm —
# rank-order Sennrich sweep — run batch-at-a-time in Python over Arrow,
# bit-identical to ``bpe_encode_py`` for ANY merges table (pruning
# skips only provably no-op sweeps), with per-worker memoization of
# unique pre-tokens bounded at ``_ENCODER_CACHE_MAX`` entries (Zipf
# makes the hit rate high for prose; numeric/identifier-heavy corpora
# have unbounded pre-token cardinality, and an uncapped dict would grow
# until the Python worker OOMs on exactly the long-running jobs this
# path exists for). ``bpe_tokens``/``bpe_token_count`` auto-switch at
# ``ARROW_SWITCH_MERGES``.
# ---------------------------------------------------------------------------

#: Fold→arrow auto-switch point, set from the measured cliff
#: (tools/bpe_scale.py; BASELINE.md r9): on this tree the fold hits a
#: hard JVM ``StackOverflowError`` in the column-node → Catalyst
#: expression conversion at 320+ nested replaces (default driver stack
#: — the cliff moves with -Xss, so don't trust headroom you haven't
#: measured), and even below the cliff its per-row cost grows linearly
#: in the merge count (O(R · doc_len) character scans) while the arrow
#: path is flat (0.3-0.5 s for 500 docs at 91 → 50k merges). 256 is the
#: highest measured-good fold point; the demo/oracle vocabulary (~91)
#: sits well under it.
ARROW_SWITCH_MERGES = 256


def load_merges(
    path: str, space_marker: str | None = "Ġ"
) -> list[tuple[str, str]]:
    """Load a ranked merges table from a GPT-2-format ``merges.txt``:
    one merge per line as ``<a> <b>`` (rank = line order), blank lines
    and the single ``#version`` header line skipped. The format has NO
    general comment syntax — a ``#``-initial line that is not the
    version header is DATA (trained tables legitimately contain
    ``#``-symbol merges), so ``# stopwords``-style annotations would
    load as phantom merges; keep notes out of the file. GPT-2's
    byte-level files spell a leading space as ``Ġ`` (U+0120);
    ``space_marker`` translates it back to a real space so the symbols
    line up with this module's pre-tokens (`` ?\\p{L}+``... keeps the
    leading space ON the pre-token). Pass ``space_marker=None`` to keep
    symbols verbatim.

    Note the scope contract: this engine pre-tokenizes with
    ``BPE_ISH_REGEX`` over unicode TEXT, not GPT-2's byte-level
    pre-tokenizer — a loaded GPT-2 table produces exact merges-table BPE
    over THIS pre-tokenization, which is the engine's documented
    semantics, not a byte-identical replica of the GPT-2 tokenizer."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            # rstrip CR too: a CRLF merges.txt would otherwise leave a
            # trailing \r on every second symbol — merges that can
            # never fire, silently degenerating to char-level encoding
            line = raw.rstrip("\r\n")
            # GPT-2 files carry exactly ONE header line ("#version:
            # ...") and it is the FIRST line; treating any '#'-initial
            # line as a comment would silently drop real merges whose
            # first symbol starts with '#' (markdown-heavy vocabularies
            # learn those), and even a '#version'-prefixed SYMBOL is
            # legal data past line 1 (review r9)
            if not line or (lineno == 1 and line.startswith("#version")):
                continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"load_merges: {path}:{lineno}: expected "
                    f"'<symbol> <symbol>', got {line!r}"
                )
            a, b = parts
            if space_marker is not None:
                a = a.replace(space_marker, " ")
                b = b.replace(space_marker, " ")
            merges.append((a, b))
    return merges


def save_merges(
    path: str,
    merges: list[tuple[str, str]],
    space_marker: str | None = "Ġ",
) -> None:
    """Write a merges table in the same GPT-2 format ``load_merges``
    reads (spaces inside symbols re-spelled as ``Ġ`` so the
    space-delimited line format stays parseable). A symbol that ALREADY
    contains the marker character fails loud (review r9): writing it
    verbatim would make ``load_merges`` translate it to a space on the
    way back — a silently different table after a save/load cycle."""
    if space_marker is not None:
        for a, b in merges:
            for part in (a, b):
                if space_marker in part:
                    raise ValueError(
                        f"save_merges: symbol {part!r} contains the "
                        f"space marker {space_marker!r} — the file "
                        "format cannot distinguish it from an encoded "
                        "space; pass a different space_marker (or "
                        "None, if no symbol contains a real space)"
                    )
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            if space_marker is not None:
                a = a.replace(" ", space_marker)
                b = b.replace(" ", space_marker)
            f.write(f"{a} {b}\n")


def synthetic_merges(
    n: int, seed: int = 80901, alphabet: str = "abcdefghijklmnopqrstuvwxyz"
) -> list[tuple[str, str]]:
    """Structurally-valid ranked merge table of size ``n`` for scale
    measurement and forced-impl equality tests: every multi-character
    symbol is the output of an earlier merge before any later merge
    consumes it — the invariant Sennrich training guarantees and the
    rank-order encoder relies on. Deterministic in ``(n, seed)``. NOT a
    trained vocabulary: it measures encode cost vs merge count; it says
    nothing about compression quality."""
    rng = random.Random(seed)
    syms: list[str] = [" "] + list(alphabet)
    seen = set(syms)
    merges: list[tuple[str, str]] = []
    while len(merges) < n:
        a = rng.choice(syms)
        b = rng.choice(syms)
        ab = a + b
        if ab in seen or len(ab) > 12:
            continue
        merges.append((a, b))
        seen.add(ab)
        syms.append(ab)
    return merges


#: Memo-cache bound for the arrow encoder: ~500k entries of short
#: tuples is low hundreds of MB worst-case — ample for prose vocabulary
#: (the whole point of the memo) while keeping identifier/numeric-heavy
#: corpora (unbounded unique pre-tokens) from growing the dict until
#: the Python worker OOMs. Past the cap, new pre-tokens encode without
#: being remembered — correctness unchanged, hit rate degrades only on
#: the long tail that was never going to repeat anyway.
_ENCODER_CACHE_MAX = 500_000


def _encoder_factory(merges: list[tuple[str, str]]):
    """Memoized pre-token encoder for one merges table — the arrow
    path's worker-side core. Bit-identical to the ``bpe_encode_py``
    loop for ANY table: the only sweeps skipped are ones where a merge
    symbol is absent from a SUPERSET of the word's current symbols
    (the set only ever grows), i.e. provably no-op passes. The cache
    maps unique pre-token → token tuple, lives for the life of the
    Python worker (repeated words across rows and batches encode once)
    and is bounded at ``_ENCODER_CACHE_MAX`` entries."""
    ms = [(a, b, a + b) for a, b in merges]
    cache: dict[str, tuple[str, ...]] = {}

    def encode(tok: str) -> tuple[str, ...]:
        got = cache.get(tok)
        if got is not None:
            return got
        word = tuple(tok)
        if len(word) > 1:
            syms = set(word)
            for a, b, ab in ms:
                if len(word) == 1:
                    break
                if a in syms and b in syms:
                    merged = _merge_word(word, (a, b))
                    if len(merged) != len(word):
                        word = merged
                        syms.add(ab)
        if len(cache) < _ENCODER_CACHE_MAX:
            cache[tok] = word
        return word

    return encode


def bpe_encode_fast_py(
    text: str,
    merges: list[tuple[str, str]] | None = None,
    _encode=None,
) -> list[str]:
    """Driver-side convenience: same result as ``bpe_encode_py`` via
    the pruned/memoized encoder (useful when the table is large)."""
    enc = _encode or _encoder_factory(
        list(merges) if merges is not None else list(default_merges())
    )
    out: list[str] = []
    for tok in pretokens_py(text):
        out.extend(enc(tok))
    return out


def _arrow_udf(merges: list[tuple[str, str]], want_tokens: bool):
    encode = _encoder_factory(merges)

    if want_tokens:

        @F.pandas_udf("array<string>")
        def _enc(s: pd.Series) -> pd.Series:
            out = []
            for t in s:
                if t is None:
                    out.append(None)
                else:
                    toks: list[str] = []
                    for tok in pretokens_py(t):
                        toks.extend(encode(tok))
                    out.append(toks)
            return pd.Series(out, dtype=object)

        return _enc

    @F.pandas_udf("long")
    def _cnt(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
            else:
                out.append(
                    sum(len(encode(tok)) for tok in pretokens_py(t))
                )
        return pd.Series(out, dtype="Int64")

    return _cnt


def bpe_tokens_arrow(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """array<string> of exact BPE tokens via an Arrow-batched pandas
    UDF — the production-vocabulary path (50k merges is a normal input
    here; the replace-fold would build a 50k-deep expression tree).
    Bit-identical to ``bpe_encode_py``/``bpe_tokens_exact``; NULL text
    stays NULL, empty text gives []."""
    c = F.col(col) if isinstance(col, str) else col
    ms = list(merges) if merges is not None else list(default_merges())
    return _arrow_udf(ms, want_tokens=True)(c)


def bpe_token_count_arrow(
    col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """Exact BPE token count via the Arrow path (counts without
    materializing the token arrays through the plan)."""
    c = F.col(col) if isinstance(col, str) else col
    ms = list(merges) if merges is not None else list(default_merges())
    return _arrow_udf(ms, want_tokens=False)(c)


def _pick_impl(impl: str, n_merges: int) -> str:
    if impl == "auto":
        return "fold" if n_merges <= ARROW_SWITCH_MERGES else "arrow"
    if impl in ("fold", "arrow"):
        return impl
    raise ValueError(
        f"bpe: unknown impl {impl!r} (expected 'auto', 'fold' or 'arrow')"
    )


def bpe_tokens(
    col: Column | str,
    merges: list[tuple[str, str]] | None = None,
    impl: str = "auto",
) -> Column:
    """Exact BPE tokens with implementation auto-switch: the
    whole-stage-codegen replace fold below ``ARROW_SWITCH_MERGES``
    merges (zero Python; DuckDB-oracle-replayable up to DuckDB's own
    ~120-merge binder ceiling — see ``bpe_wrapped_sql``'s depth note),
    the Arrow-batched encoder above it (flat in merge count). Both are
    bit-identical to ``bpe_encode_py``; ``impl='fold'``/``'arrow'``
    forces a path."""
    ms = list(merges) if merges is not None else list(default_merges())
    if _pick_impl(impl, len(ms)) == "fold":
        return bpe_tokens_exact(col, ms)
    return bpe_tokens_arrow(col, ms)


def bpe_token_count(
    col: Column | str,
    merges: list[tuple[str, str]] | None = None,
    impl: str = "auto",
) -> Column:
    """Exact BPE token count with the same auto-switch as
    ``bpe_tokens``."""
    ms = list(merges) if merges is not None else list(default_merges())
    if _pick_impl(impl, len(ms)) == "fold":
        return bpe_token_count_exact(col, ms)
    return bpe_token_count_arrow(col, ms)


def bpe_vocab(
    merges: list[tuple[str, str]] | None = None,
    alphabet: str | None = None,
) -> list[str]:
    """Token-id table for a merges list: id = list index. Base symbols
    first (the sorted distinct characters appearing in the merge
    symbols, plus any explicitly passed ``alphabet`` characters), then
    one merged symbol per merge in rank order — the constructive id
    order byte-pair encoders use when no explicit vocab file exists.
    Deterministic in (merges, alphabet), so trainer + vocab + encoder
    reproduce identical id streams on every run and engine."""
    ms = list(merges) if merges is not None else list(default_merges())
    chars = set(alphabet or "")
    for a, b in ms:
        chars.update(a)
        chars.update(b)
    vocab = sorted(chars)
    seen = set(vocab)
    for a, b in ms:
        ab = a + b
        if ab not in seen:
            vocab.append(ab)
            seen.add(ab)
    return vocab


def bpe_token_ids(
    col: Column | str,
    merges: list[tuple[str, str]] | None = None,
    vocab: list[str] | None = None,
    unk_id: int = -1,
) -> Column:
    """array<int> of exact BPE token IDS — what a training pipeline
    actually materializes (packing, shuffling and sharding operate on
    id streams, not strings). Arrow path only: the id lookup is one
    dict probe per token inside the same batch loop the encoder
    already runs, so it costs nothing extra at any merge count, while
    an engine-side map literal would re-hit the fold's expression-size
    cliff at production vocabularies. Tokens outside the vocabulary
    (characters never seen in the merge symbols/alphabet) map to
    ``unk_id``; NULL text stays NULL, empty text gives []."""
    c = F.col(col) if isinstance(col, str) else col
    ms = list(merges) if merges is not None else list(default_merges())
    vs = vocab if vocab is not None else bpe_vocab(ms)
    ids = {s: i for i, s in enumerate(vs)}
    encode = _encoder_factory(ms)

    @F.pandas_udf("array<int>")
    def _enc_ids(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
            else:
                row: list[int] = []
                for tok in pretokens_py(t):
                    row.extend(
                        ids.get(sym, unk_id) for sym in encode(tok)
                    )
                out.append(row)
        return pd.Series(out, dtype=object)

    return _enc_ids(c)


def train_bpe_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    sample_n: int = 1024,
    num_merges: int = DEFAULT_NUM_MERGES,
    min_freq: int = 2,
    salt: int = 0,
) -> list[tuple[str, str]]:
    """Train a merges table from a Spark corpus: deterministic
    salted-hash sample (the PQ-codebook pattern —
    operators/similarity.py's kmeans seed sampling), bounded collect of
    ``sample_n`` texts, then the existing driver-side Sennrich trainer.
    Order is ``xxhash64(salt, text)`` with the text itself as
    tie-break, so the sample — and therefore the learned table — is
    identical across runs, partitionings and cluster sizes. The
    trainer stays a bounded-artifact computation; the DISTRIBUTED
    piece is the encode, which is where the 100 TB cost lives."""
    c = F.col(text_col)
    rows = (
        df.select(c.alias("_t"))
        .where(c.isNotNull() & (F.length(c) > 0))
        .orderBy(F.xxhash64(F.lit(salt), F.col("_t")), F.col("_t"))
        .limit(int(sample_n))
        .collect()
    )
    return train_bpe_merges(
        [r["_t"] for r in rows], num_merges=num_merges, min_freq=min_freq
    )
