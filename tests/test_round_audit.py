"""Gate: the raw-double cross-engine ROUND class stays extinct.

Round 12 caught two genuine scale-dependent divergences of the same
shape — both engines ROUND a double with k >= 1 and disagree, either
because the doubles differ (summation order) or because the two ROUND
implementations disagree on the identical boundary-adjacent double
(Spark rounds the exact BigDecimal of the double; DuckDB
multiply-shifts). Round 13 converted every such site in the package to
the shared floor form ``FLOOR(x * 10^k + 0.5) / 10^k`` (identical IEEE
op sequence in both engines, bit-equal by construction — see
functions/microunit) or the string-form half-up rational division.

This gate re-runs the static scan live, so a NEW raw ROUND(expr, k>=1)
site anywhere in package source fails CI until it is converted or
carries a whitelist entry (with a recorded cross-engine safety reason)
in AUDIT_ROUND.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _live_scan():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_round import scan

    return scan()


def test_no_unclassified_rounding_sites():
    """Every flagged rounding call site must be whitelisted (content-
    addressed by (file, first-line text)) in AUDIT_ROUND.json."""
    with open(os.path.join(REPO, "AUDIT_ROUND.json")) as fh:
        committed = json.load(fh)
    whitelisted = {
        (w["file"], w["text"]) for w in committed.get("whitelist", [])
    }
    bad = [
        s
        for s in _live_scan()
        if (s["file"], s["text"]) not in whitelisted
    ]
    assert bad == [], (
        "raw cross-engine ROUND(expr, k>=1) sites found — convert to the "
        "floor form (tools/convert_round.py) or whitelist with a reason "
        f"in AUDIT_ROUND.json: {bad[:10]}"
    )


def test_round_audit_artifact_fresh():
    """The committed artifact must describe the current source tree:
    no unclassified sites recorded, and no whitelist entry pointing at
    text that no longer exists (stale entries hide regressions behind
    content-address reuse)."""
    with open(os.path.join(REPO, "AUDIT_ROUND.json")) as fh:
        committed = json.load(fh)
    assert committed["n_unclassified"] == 0, (
        "AUDIT_ROUND.json records unclassified sites — classify them and "
        "regenerate with tools/audit_round.py"
    )
    live_keys = {(s["file"], s["text"]) for s in _live_scan()}
    stale = [
        (w["file"], w["text"])
        for w in committed.get("whitelist", [])
        if (w["file"], w["text"]) not in live_keys
    ]
    assert stale == [], (
        f"whitelist entries no longer matching any source line: {stale} "
        "— regenerate AUDIT_ROUND.json"
    )
