"""Source-lint pins (no Spark session).

``tokens()`` without ``drop_empty=True`` inherits the
empty-string-matches-empty-doc bug class the r10 probe found (an empty
document tokenizes to ``[""]``, a one-empty-token array that matches
other empty docs in shingle/minhash/count paths). New gate code must
pass ``drop_empty=True``; the 16 legacy sites below (all in
``llm_q.py``, written before the r10 finding, each individually audited
as benign for its fixture — VERDICT r11 What's-wrong #3 / r12 #2) are
FROZEN by per-file count. Converting a legacy site lowers the count
(tighten the freeze then); adding a bare site anywhere fails here.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_DIR = os.path.join(REPO, "puffbird_spark", "queries")

# frozen legacy allowlist: basename -> number of bare tokens() calls
_LEGACY_BARE_TOKENS = {"llm_q.py": 16}


def _bare_token_calls(src: str):
    """Yield each ``tokens(...)`` call (balanced-paren scan, so a
    drop_empty on a wrapped line still counts as covered) that does
    not pass ``drop_empty``."""
    for m in re.finditer(r"\btokens\(", src):
        i, depth = m.end(), 1
        while depth and i < len(src):
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        call = src[m.start():i]
        if "drop_empty" not in call:
            yield src[:m.start()].count("\n") + 1, call


def test_queries_tokens_require_drop_empty():
    counts = {}
    details = {}
    for path in sorted(glob.glob(os.path.join(QUERIES_DIR, "*.py"))):
        name = os.path.basename(path)
        with open(path) as fh:
            src = fh.read()
        found = list(_bare_token_calls(src))
        if found:
            counts[name] = len(found)
            details[name] = [line for line, _ in found]
    for name, n in counts.items():
        allowed = _LEGACY_BARE_TOKENS.get(name, 0)
        assert n <= allowed, (
            f"{name} has {n} bare tokens() call(s) at lines "
            f"{details[name]} but only {allowed} frozen legacy site(s) — "
            f"new code must pass drop_empty=True (r10 probe bug class)")


def test_legacy_allowlist_not_stale():
    """The freeze must not drift ABOVE reality either — if legacy sites
    get converted, tighten the allowlist so it cannot quietly re-grow."""
    for name, allowed in _LEGACY_BARE_TOKENS.items():
        path = os.path.join(QUERIES_DIR, name)
        with open(path) as fh:
            n = len(list(_bare_token_calls(fh.read())))
        assert n == allowed, (
            f"{name}: allowlist says {allowed} legacy sites, found {n} — "
            f"update _LEGACY_BARE_TOKENS to match")
