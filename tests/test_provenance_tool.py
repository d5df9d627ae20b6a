"""tools/check_provenance.py unit coverage (pure functions only).

The checker audits every runs/ artifact cited in the docs against the
tree; these tests pin its citation-pattern handling so doc edits cannot
silently stop matching.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.check_provenance import CITE_RE, expand_braces, normalize_citation


def test_expand_braces_simple():
    assert expand_braces("runs/a.json") == ["runs/a.json"]


def test_expand_braces_single_group():
    assert expand_braces("runs/freeze_{8,16,32}_*.json") == [
        "runs/freeze_8_*.json",
        "runs/freeze_16_*.json",
        "runs/freeze_32_*.json",
    ]


def test_expand_braces_nested_groups():
    out = expand_braces("runs/{a,b}_{1,2}.json")
    assert out == ["runs/a_1.json", "runs/a_2.json",
                   "runs/b_1.json", "runs/b_2.json"]


def test_cite_regex_matches_doc_forms():
    text = ("see `runs/topo16_r5.json` and runs/freeze_{8,16,32}_*.json, "
            "plus runs/quickstart_b5* and runs/h2h/ for details")
    hits = [normalize_citation(h) for h in CITE_RE.findall(text)]
    assert "runs/topo16_r5.json" in hits
    assert "runs/freeze_{8,16,32}_*.json" in hits
    assert any(h.startswith("runs/quickstart_b5") for h in hits)
    assert any(h.startswith("runs/h2h") for h in hits)
