"""Quiet-window watcher for the 8→32 scaling re-measurement.

The 8→32 efficiency headline needs a quiet co-tenant window (probe
>=700 docs/s at local[32] on the 12800-doc corpus — CLAUDE.md lever 0),
and four sessions have passed without catching one by hand. This
watcher automates the protocol: probe every ``QW_INTERVAL_SEC``;
the moment a probe clears the bar, immediately run short interleaved
8↔32 pairs (SCALING_INNER_REPEATS=1 SCALING_REPEATS=1) plus a solo
kernel timing in the same window, and keep firing pairs while follow-up
probes stay quiet. Everything is appended as JSON lines to
``BENCH/quiet_watch_r5.jsonl`` with timestamps, so the round's evidence
records which window produced which number.

Run detached:  nohup python tools/quiet_watch.py >/dev/null 2>&1 &
Stop:          touch /tmp/quiet_watch.stop
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "quiet_watch_r5.jsonl")
STOP = "/tmp/quiet_watch.stop"
BAR = float(os.environ.get("QW_BAR", "700"))
INTERVAL = int(os.environ.get("QW_INTERVAL_SEC", "480"))
MAX_PAIRS_PER_WINDOW = 3


def log(rec: dict) -> None:
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_json(
    cmd: list[str], env: dict, timeout: int, last_line: bool = False
) -> dict | None:
    try:
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout,
            cwd=REPO,
        )
        lines = out.stdout.strip().splitlines()
        if last_line:  # tools that emit one JSON line per level
            return json.loads(lines[-1])
        # --pair prints indented JSON; --one prints one line
        text = "\n".join(lines)
        start = text.index("{")
        return json.loads(text[start:])
    except Exception as e:  # noqa: BLE001 — log and keep watching
        log({"kind": "error", "cmd": cmd[-1], "err": str(e)[:300]})
        return None


def probe(env: dict) -> float | None:
    r = run_json(
        [sys.executable, "tools/scaling_run.py", "--one"], env, 600
    )
    if r is None:
        return None
    log({"kind": "probe", "docs_per_sec": r.get("docs_per_sec")})
    return r.get("docs_per_sec")


def main() -> None:
    base = dict(os.environ)
    base.update({
        "SCALING_DOCS": "12800",
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
    })
    log({"kind": "start", "bar": BAR, "interval": INTERVAL})
    while not os.path.exists(STOP):
        p = probe(base)
        if p is not None and p >= BAR:
            log({"kind": "window_open", "probe": p})
            # HALF-PAIR FIRST (learned 2026-08-19 08:04 window): the opening
            # probe IS a quiet local[32] measurement of the same job, so the
            # complementary local[8] run must happen in the window's very
            # first (quietest) seconds — the old order burned ~36 s on solo
            # probes and the full pair then caught returning load (0.664 vs
            # an implied 0.765 from probe+local8 in that same window).
            lo_env = dict(base)
            lo_env.update({
                "SPARK_GRAFT_CPUS": "8", "SCALING_INNER_REPEATS": "1",
            })
            r8 = run_json(
                [sys.executable, "tools/scaling_run.py", "--one"],
                lo_env, 900,
            )
            if r8 is not None:
                log({
                    "kind": "half_pair", "local8": r8, "local32_probe": p,
                    "eff_8_to_32": round(p / r8["docs_per_sec"] / 4.0, 3),
                })
            # solo kernel timing (7 s) then a confirm probe: if still quiet,
            # the half-pair above is probe-sandwiched (strong evidence) and
            # the window has room for full interleaved pairs.
            k = run_json(
                [sys.executable, "tools/kernel_solo.py"], base, 900
            )
            if k is not None:
                log({"kind": "kernel_solo", **k})
            pair_env = dict(base)
            pair_env.update({
                "SCALING_INNER_REPEATS": "1", "SCALING_REPEATS": "1",
            })
            closed = False
            for i in range(MAX_PAIRS_PER_WINDOW):
                p2 = probe(base)
                if p2 is None or p2 < BAR:
                    log({"kind": "window_closed", "probe": p2, "after": i})
                    closed = True
                    break
                if i == 0 and r8 is not None:
                    log({"kind": "half_pair_sandwich", "probe_before": p,
                         "probe_after": p2,
                         "eff_8_to_32_worst_probe": round(
                             min(p, p2) / r8["docs_per_sec"] / 4.0, 3)})
                r = run_json(
                    [sys.executable, "tools/scaling_run.py", "--pair"],
                    pair_env, 1800,
                )
                if r is not None:
                    log({"kind": "pair", "n": i, **r})
            if not closed:
                log({"kind": "window_exhausted"})
            # contention battery LAST (already captured once on 08-19; keep
            # re-recording per window — it's ~30 s and window-dependent)
            rp_env = dict(base)
            rp_env.update({"RESIDENTS": "1,8,32", "PROBE_SPANS": "120",
                           "PROBE_REPEATS": "2"})
            for tool, kind in (
                ("tools/resident_probe.py", "resident_probe"),
                ("tools/compute_probe.py", "compute_probe"),
                ("tools/stream_probe.py", "stream_probe"),
            ):
                r = run_json(
                    [sys.executable, tool], rp_env, 900, last_line=True
                )
                if r is not None:
                    log({"kind": kind, **r})
        time.sleep(INTERVAL)
    log({"kind": "stopped"})


if __name__ == "__main__":
    main()
