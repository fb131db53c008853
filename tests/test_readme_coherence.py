"""Guard against README/benchmark-artifact drift.

The README quotes headline numbers "copied directly from BENCH_rNN.json".
This test re-derives every quoted number from the artifact the README
itself names and asserts the quoted strings actually appear -- so a
hand-edited README (or a README left stale after re-benchmarking and
re-pointing it at a new artifact) fails CI instead of shipping
(round-2 advisor finding: quoted numbers had drifted from the artifact).
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_named_artifact():
    readme = open(os.path.join(REPO, "README.md")).read()
    names = set(re.findall(r"BENCH(?:_DETAIL)?_r\d+(?:_local)?\.json", readme))
    assert names, "README no longer names its benchmark artifact"
    # The README must quote from exactly one artifact generation.
    assert len(names) == 1, f"README cites multiple artifacts: {names}"
    name = names.pop()
    path = os.path.join(REPO, name)
    assert os.path.exists(path), f"README cites {name}, which does not exist"
    with open(path) as fh:
        artifact = json.load(fh)
    if "detail" in artifact:
        # Full-detail sidecar format (round 5+): the artifact IS the
        # enriched result object written by bench.emit().
        parsed = artifact
    else:
        # Driver-capture format (rounds 1-4): the parsed stdout line.
        parsed = artifact.get("parsed")
    assert parsed, f"README cites {name}, but it has no parsed result"
    return readme, parsed


def test_readme_headline_matches_cited_artifact():
    readme, parsed = _load_named_artifact()
    detail = parsed["detail"]
    checks = {
        "end-to-end s": f"**{detail['end_to_end_s']:.1f} s**",
        "factorize s": f"factorize {detail['factorize_s']:.1f} s",
        "sweep s": f"sweep {detail['warm_sweep_s']:.2f} s",
        "warm sweep": f"**{detail['warm_sweep_s']:.2f} s**",
        "speedup": f"~{round(parsed['vs_baseline'], -2):,.0f}".replace(
            ".0", ""
        )
        + "×",
        "cpu total s": f"~{round(detail['cpu_baseline_total_s'], -2):,.0f} s",
        "ms/point": (
            f"({1000 * detail['warm_sweep_s'] / _batch_size(parsed):.0f} ms/point)"
        ),
    }
    missing = {
        what: quote for what, quote in checks.items() if quote not in readme
    }
    assert not missing, (
        "README drifted from its cited artifact; expected these exact "
        f"quotes: {missing}"
    )


def _batch_size(parsed):
    m = re.search(r"factorize\+(\d+)-point", parsed["metric"])
    assert m, f"cannot find batch size in metric: {parsed['metric']}"
    return int(m.group(1))


def test_readme_scanning_claim_matches_artifact_when_recorded():
    readme, parsed = _load_named_artifact()
    scan = parsed["detail"].get("scanning_sweep")
    m = re.search(r"\*\*(\d+(?:\.\d+)?) ms/position\*\*", readme)
    if not (scan and isinstance(scan, dict) and "ms_per_position_warm" in scan):
        pytest.skip("cited artifact has no scanning_sweep detail")
    assert m, "README no longer quotes a ms/position scanning number"
    assert float(m.group(1)) == pytest.approx(
        scan["ms_per_position_warm"], rel=0.05
    ), "README scanning ms/position drifted from the cited artifact"
