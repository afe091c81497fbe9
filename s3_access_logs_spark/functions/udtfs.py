"""Python UDTF escape hatch (SURVEY §2.3 UDF/UDAF/UDTF row).

Nothing in the engine's hot path needs these — every shipped operator is
built-in-expression or Arrow-batched (see tests/test_plan_shapes.py) —
but the category exists for table-generating logic that neither
``explode`` of an array expression nor ``mapInPandas`` expresses cleanly:
per-row expansion whose arity and shape depend on imperative logic.

``TokenizeDiagnostics`` is the worked example: it re-runs the access-log
tokenizer per line and yields one row per token with its position, span
and delimiter class — the debugging view you want when a malformed line
parses to NULLs and you need to see *which* field shifted. Row-at-a-time
Python (BatchEvalPythonUDTF in the plan): keep it on samples, never on
the 100 TB scan.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Same pattern as the engine tokenizer (schema.py:TOKEN_REGEX) and the
# reference (s3access/serializer.py:5).
_TOKEN_RE = re.compile(r'(?:"[^"]+")|(?:\[[^\]]+\])|(?:[^ ]+)')


@udtf(returnType="pos: int, token: string, start: int, end: int, kind: string")
class TokenizeDiagnostics:
    """One row per token: (pos, stripped token, char span, delimiter kind)."""

    def eval(self, line: str):  # noqa: D102
        if line is None:
            return
        for pos, m in enumerate(_TOKEN_RE.finditer(line.strip())):
            tok = m.group(0)
            if tok.startswith('"') and tok.endswith('"') and len(tok) > 2:
                kind, out = "quoted", tok[1:-1]
            elif tok.startswith("[") and tok.endswith("]") and len(tok) > 2:
                kind, out = "bracketed", tok[1:-1]
            else:
                kind, out = "bare", tok
            yield pos, out, m.start(), m.end(), kind
