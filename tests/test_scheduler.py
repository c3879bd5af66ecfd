"""Job-scheduler surface (ST5 analog; out-of-dataplane per north rule)."""

import datetime as dt
import json

import pytest

from web_scrapper_ray.schedulers import (
    JobScheduler,
    _parse_trigger,
    next_cron_fire,
    parse_cron,
)


def test_parse_trigger():
    assert _parse_trigger("every 5m") == 300
    assert _parse_trigger("2h") == 7200
    assert _parse_trigger("every 30s") == 30
    assert _parse_trigger("45") == 45


def _ts(*a):
    return dt.datetime(*a).timestamp()


def test_cron_next_fire():
    # nightly at 03:00
    assert next_cron_fire("0 3 * * *", _ts(2026, 8, 17, 2, 59)) == _ts(2026, 8, 17, 3, 0)
    assert next_cron_fire("0 3 * * *", _ts(2026, 8, 17, 3, 0)) == _ts(2026, 8, 18, 3, 0)
    # every 15 min
    assert next_cron_fire("*/15 * * * *", _ts(2026, 8, 17, 10, 7)) == _ts(2026, 8, 17, 10, 15)
    # weekdays at 9 (2026-08-17 is a Monday; Friday 21st → Monday 24th)
    assert next_cron_fire("0 9 * * 1-5", _ts(2026, 8, 21, 10, 0)) == _ts(2026, 8, 24, 9, 0)
    # first of month
    assert next_cron_fire("30 0 1 * *", _ts(2026, 8, 17, 0, 0)) == _ts(2026, 9, 1, 0, 30)
    # dom/dow OR quirk: 13th OR friday, whichever first
    assert next_cron_fire("0 0 13 * 5", _ts(2026, 8, 17, 0, 0)) == _ts(2026, 8, 21, 0, 0)
    # ranges with step + lists
    assert sorted(parse_cron("1,2,10-14/2 * * * *")[0][0]) == [1, 2, 10, 12, 14]
    # Vixie/cronie: 7 = Sunday in dow, including as a range endpoint
    assert sorted(parse_cron("* * * * 7")[4][0]) == [0]
    assert sorted(parse_cron("* * * * 5-7")[4][0]) == [0, 5, 6]   # Fri–Sun
    assert sorted(parse_cron("* * * * 0-7")[4][0]) == [0, 1, 2, 3, 4, 5, 6]
    # 2026-08-21 is a Friday; '5-7' must fire then, not raise
    assert next_cron_fire("0 9 * * 5-7", _ts(2026, 8, 20, 10, 0)) == _ts(2026, 8, 21, 9, 0)


def test_cron_invalid():
    with pytest.raises(ValueError):
        parse_cron("0 3 * *")          # 4 fields
    with pytest.raises(ValueError):
        parse_cron("61 * * * *")       # out of range
    with pytest.raises(ValueError):
        parse_cron("*/0 * * * *")      # zero step


def test_cron_job_schedule_and_missed_fire_catchup(tmp_path):
    s = JobScheduler(str(tmp_path / "jobs.json"))
    jid = s.schedule_job("nightly", str(tmp_path / "missing.yaml"), "0 3 * * *")
    job = s.get_job(jid)
    assert job["interval_s"] is None
    nxt = dt.datetime.fromtimestamp(job["next_run"])
    assert (nxt.hour, nxt.minute) == (3, 0)
    # runner was down for 3 days → job is due; ONE catch-up run, then
    # the next fire is the next 03:00 after "now"
    later = job["next_run"] + 3 * 86400 + 1800
    assert [j["job_id"] for j in s.due_jobs(now=later)] == [jid]
    s.run_job(jid, now=later)
    job = s.get_job(jid)
    assert job["last_status"] == "failed"  # missing config → subprocess fails
    assert job["next_run"] == next_cron_fire("0 3 * * *", later)
    assert s.due_jobs(now=later) == []


def test_schedule_list_due_remove(tmp_path):
    s = JobScheduler(str(tmp_path / "jobs.json"))
    jid = s.schedule_job("nightly", "/tmp/cfg.yaml", "every 1h",
                         email="ops@real.org", webhook="http://hook.real.org/x")
    assert s.get_job(jid)["status"] == "scheduled"
    assert len(s.list_jobs()) == 1
    now = s.get_job(jid)["created_at"]
    assert s.due_jobs(now=now) == []
    assert [j["job_id"] for j in s.due_jobs(now=now + 3601)] == [jid]
    # persistence across instances
    s2 = JobScheduler(str(tmp_path / "jobs.json"))
    assert s2.get_job(jid)["name"] == "nightly"
    assert s2.remove_job(jid) and not s2.list_jobs()


def test_run_updates_metadata_and_notifies(tmp_path):
    s = JobScheduler(str(tmp_path / "jobs.json"))
    # config path that doesn't exist → subprocess fails → last_status failed
    jid = s.schedule_job("bad", str(tmp_path / "missing.yaml"), "1m",
                         webhook="http://hook.real.org/x")
    out = s.run_job(jid)
    assert out["returncode"] != 0
    job = s.get_job(jid)
    assert job["last_status"] == "failed"
    assert job["last_run"] is not None
    notes = (tmp_path / "notifications.log").read_text().strip().splitlines()
    assert len(notes) == 1 and json.loads(notes[0])["channel"] == "webhook"


def test_webhook_notification_delivery(tmp_path):
    """Real webhook POST (reference job_scheduler.py:450-484 payload
    shape) against a local HTTP server."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received = []

    class Hook(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            received.append((self.path, json.loads(body)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Hook)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        s = JobScheduler(str(tmp_path / "jobs.json"))
        jid = s.schedule_job("hooked", str(tmp_path / "missing.yaml"), "1m",
                             webhook=f"http://127.0.0.1:{srv.server_port}/notify")
        s.run_job(jid)
        assert len(received) == 1
        path, payload = received[0]
        assert path == "/notify"
        assert payload["job_id"] == jid and payload["job_name"] == "hooked"
        assert payload["status"] == "failed" and "error" in payload
        notes = (tmp_path / "notifications.log").read_text().strip().splitlines()
        assert json.loads(notes[-1])["sent"] is True
    finally:
        srv.shutdown()


def test_cron_next_fire_property():
    """Property: next_cron_fire returns a time strictly after `after`
    whose local datetime satisfies every cron field (dom/dow OR rule)."""
    import datetime as dtm

    from hypothesis import given, settings
    from hypothesis import strategies as st

    field = st.one_of(
        st.just("*"),
        st.integers(0, 59).map(str),
        st.tuples(st.integers(0, 20), st.integers(1, 20)).map(
            lambda t: f"{t[0]}-{t[0] + t[1]}"),
        st.just("*/5"), st.just("*/15"),
    )

    def clamp(spec, lo, hi):
        # rewrite numeric parts into range
        out = []
        for part in spec.split(","):
            if part.startswith("*"):
                out.append(part)
                continue
            if "-" in part:
                a, b = part.split("-")
                a, b = max(lo, min(hi, int(a))), max(lo, min(hi, int(b)))
                out.append(f"{min(a, b)}-{max(a, b)}")
            else:
                out.append(str(max(lo, min(hi, int(part)))))
        return ",".join(out)

    @settings(max_examples=60, deadline=None)
    @given(field, field, field, field, field,
           st.integers(1_600_000_000, 1_900_000_000))
    def run(m, h, dom, mon, dow, after):
        expr = " ".join([clamp(m, 0, 59), clamp(h, 0, 23), clamp(dom, 1, 31),
                         clamp(mon, 1, 12), clamp(dow, 0, 6)])
        try:
            fire = next_cron_fire(expr, after)
        except ValueError as e:
            assert "never fires" in str(e)  # e.g. dom=31 in Feb-only crons
            return
        assert fire > after
        d = dtm.datetime.fromtimestamp(fire)
        (mins, _), (hrs, _), (doms, dom_w), (mons, _), (dows, dow_w) = \
            parse_cron(expr)
        assert d.minute in mins and d.hour in hrs and d.month in mons
        dom_ok, dow_ok = d.day in doms, d.isoweekday() % 7 in dows
        if not dom_w and not dow_w:
            assert dom_ok or dow_ok
        else:
            assert dom_ok and dow_ok

    run()


def test_cron_step_wildcard_keeps_star_flag():
    """Vixie semantics: '*/2' in dom keeps the star flag, so dom/dow
    combine with AND (restricted-dow only), not OR."""
    # 2026-08-17 is a Monday. '0 0 */2 * 1' = odd days that are Mondays
    # (dom star flag set) -> next fire must be a Monday on an odd day.
    fire = next_cron_fire("0 0 */2 * 1", _ts(2026, 8, 17, 1, 0))
    d = dt.datetime.fromtimestamp(fire)
    assert d.isoweekday() == 1 and d.day % 2 == 1
    # an OR interpretation would fire the very next odd day (Aug 19, Wed)
    assert (d.month, d.day) != (8, 19)


def test_cron_dow_seven_and_names():
    """Standard cron accepts 7 as Sunday and month/day names."""
    # 2026-08-23 is a Sunday
    assert next_cron_fire("0 0 * * 7", _ts(2026, 8, 17, 1, 0)) == _ts(2026, 8, 23, 0, 0)
    assert next_cron_fire("0 0 * * sun", _ts(2026, 8, 17, 1, 0)) == _ts(2026, 8, 23, 0, 0)
    assert next_cron_fire("0 9 * * mon-fri", _ts(2026, 8, 21, 10, 0)) == _ts(2026, 8, 24, 9, 0)
    assert next_cron_fire("0 0 1 sep *", _ts(2026, 8, 17, 0, 0)) == _ts(2026, 9, 1, 0, 0)


def test_daemon_fires_twice_without_overlap(tmp_path):
    """ST5 daemon mode (reference BackgroundScheduler, max_instances):
    a fast interval job fires at least twice across the daemon loop,
    and with max_instances=1 a slow run is never overlapped — the due
    fire is skipped, not queued."""
    import threading
    import time as _time

    s = JobScheduler(str(tmp_path / "jobs.json"))
    jid = s.schedule_job("fast", str(tmp_path / "cfg.yaml"), "1")
    # make the job due immediately
    s.jobs[jid]["next_run"] = _time.time() - 1
    s._save()

    runs = []
    lock = threading.Lock()

    def slow_runner(job_id):
        t0 = _time.time()
        # sub-interval trigger cadence: due again IMMEDIATELY (faster
        # than the 0.25s run) — the daemon must skip, not overlap
        s.jobs[job_id]["next_run"] = t0 - 0.01
        _time.sleep(0.25)
        with lock:
            runs.append((t0, _time.time()))
        s.jobs[job_id]["next_run"] = _time.time() - 0.01

    stats = s.run_daemon(poll_s=0.1, max_instances=1, max_ticks=12,
                         runner=slow_runner)
    assert stats["fired"] >= 2
    # a 0.25s run across 0.1s polls MUST have produced skips (overlap
    # prevented, not queued)
    assert stats["skipped"] >= 1
    runs.sort()
    for (_, end_prev), (start_next, _) in zip(runs, runs[1:]):
        assert start_next >= end_prev - 0.01, "overlapping executions"


def test_daemon_cli_surface(tmp_path):
    """`wsr schedule daemon --max-ticks N` runs the loop and reports."""
    import json as _json
    import subprocess
    import sys

    store = str(tmp_path / "jobs.json")
    out = subprocess.run(
        [sys.executable, "-m", "web_scrapper_ray.cli", "schedule", "daemon",
         "--store", store, "--poll-s", "0.05", "--max-ticks", "3"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["ticks"] == 3 and stats["fired"] == 0
