"""COVERAGE.md ledger integrity: every gate name the ledger cites
must be a real ``queries()`` key (guards against gate-name drift like
the round-4 ``window_frame`` vs ``rolling_window`` mismatch)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: bold-backtick tokens in COVERAGE.md that are legitimately not gate
#: names (metric values, file names, SQL keywords, numbers, ...)
_GATE_RE = re.compile(r"gates?\s+\*\*`([a-z0-9_]+)`\*\*")
#: continuation lists after "gates": **`a`**, **`b`** and **`c`**
_LIST_RE = re.compile(
    r"gates?\s+((?:\*\*`[a-z0-9_]+`\*\*(?:\s*[,/]\s*|\s+and\s+|\s*\+\s*)?)+)")
_TOKEN_RE = re.compile(r"\*\*`([a-z0-9_]+)`\*\*")


def _cited_gates(text: str) -> set[str]:
    names = set()
    for m in _LIST_RE.finditer(text):
        names.update(_TOKEN_RE.findall(m.group(1)))
    names.update(_GATE_RE.findall(text))
    return names


def test_coverage_gate_names_exist():
    import __ray_entry__ as em

    qs = set(em.queries())
    text = (REPO / "COVERAGE.md").read_text()
    cited = _cited_gates(text)
    assert cited, "extraction regex found no gate citations"
    unknown = sorted(cited - qs)
    assert not unknown, f"COVERAGE.md cites unknown gates: {unknown}"


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as em

    qs, osql = set(em.queries()), set(em.oracle_sql())
    assert osql <= qs, sorted(osql - qs)
