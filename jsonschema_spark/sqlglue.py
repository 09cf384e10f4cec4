"""Small helpers shared across the Spark backend."""

from __future__ import annotations

# ECMA-262 → java.util.regex dialect normalization (SURVEY.md A9).
# The dialects agree on the constructs the engine's corpus uses; the two
# divergences that matter in practice are handled here.
_REPLACEMENTS = [
    # ECMA \d is ASCII-only; Java \d is ASCII-only too (agree). But ECMA
    # allows a bare '/' unescaped while Java treats '\/' as an error-free
    # escape only in some versions — normalize '\/' to '/'.
    (r"\/", "/"),
    # ECMA $ matches end-of-string; Java $ matches before a final newline.
    # JSON Schema 'pattern' is a *search*, both engines use find(), so no
    # anchor rewrite is required.
]


def to_java_regex(pattern: str) -> str:
    out = pattern
    for a, b in _REPLACEMENTS:
        out = out.replace(a, b)
    return out
