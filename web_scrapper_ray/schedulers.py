"""Job scheduler surface (reference ST5/§3.2:
`/root/reference/src/webscraper/schedulers/job_scheduler.py:43-603`).

The reference runs scrapes on APScheduler threads with SQLite job
metadata. Per the north rule the cron layer sits OUTSIDE the dataplane:
each fire is an independent engine run (`ray job submit` on a cluster;
a `python -m web_scrapper_ray.cli scrape` subprocess here). This module
keeps the reference's job-metadata surface — schedule/list/remove,
last_run/last_status, email/webhook notification hooks — backed by a
JSON store (SQLite adds nothing for a metadata table this small), with
interval and full 5-field cron triggers.

Notifications are REAL senders (reference payload shapes): webhook =
requests.post JSON, email = smtplib gated on WEBSCRAPER_SMTP_* env
vars; every attempt is also appended to ``notifications.log`` (the
audit trail and deterministic test surface).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import uuid
from typing import Any, Optional


def _parse_trigger(trigger: str) -> int:
    """'every 5m' / 'every 2h' / 'every 30s' / plain seconds → seconds."""
    t = trigger.strip().lower()
    if t.startswith("every "):
        t = t[6:].strip()
    mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}
    if t and t[-1] in mult:
        return int(float(t[:-1]) * mult[t[-1]])
    return int(float(t))


# ---------------------------------------------------------------------------
# 5-field cron (reference `--cron` surface: APScheduler CronTrigger at
# job_scheduler.py:64-75,522-603 — minute hour day-of-month month
# day-of-week, standard syntax incl. "*", "*/n", "a-b", "a-b/n",
# lists, and the dom/dow OR quirk)
# ---------------------------------------------------------------------------

_MON_NAMES = {n: i + 1 for i, n in enumerate(
    "jan feb mar apr may jun jul aug sep oct nov dec".split())}
_DOW_NAMES = {n: i for i, n in enumerate(
    "sun mon tue wed thu fri sat".split())}
# (lo, hi, name-alias map, normalizer) per field; dow accepts 7=Sunday
_CRON_FIELDS = (
    (0, 59, {}, None),
    (0, 23, {}, None),
    (1, 31, {}, None),
    (1, 12, _MON_NAMES, None),
    (0, 6, _DOW_NAMES, lambda v: 0 if v == 7 else v),
)


def _cron_value(token: str, names: dict, norm) -> int:
    v = names.get(token.lower())
    if v is None:
        v = int(token)
    if norm is not None:
        v = norm(v)
    return v


def _parse_cron_field(spec: str, lo: int, hi: int, names: dict = {},
                      norm=None) -> tuple[set, bool]:
    """One cron field → (allowed values, was_wildcard). Supports *, */n,
    a-b, a-b/n, lists, month/day names (jan..dec, sun..sat) and 7 as
    Sunday in the day-of-week field (standard cron)."""
    vals: set[int] = set()
    # Vixie/cronie: the star flag (dom/dow OR rule) is set whenever the
    # field STARTS with '*' — including step wildcards like */2
    wild = spec.startswith("*")
    # ranges are expanded BEFORE normalization so Vixie-compatible dow
    # ranges ending in 7 ('5-7' = Fri–Sun) work: 7 is in-range for the
    # raw check, and norm (7→0) is applied per expanded value
    hi_raw = hi + 1 if norm is not None else hi
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError("cron step must be positive")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = _cron_value(a_s, names, None), _cron_value(b_s, names, None)
        else:
            a = b = _cron_value(part, names, None)
        if not (lo <= a <= hi_raw and lo <= b <= hi_raw and a <= b):
            raise ValueError(f"cron value out of range [{lo},{hi}]: {part}")
        expanded = range(a, b + 1, step)
        vals.update((norm(v) for v in expanded) if norm is not None else expanded)
    return vals, wild


def parse_cron(expr: str) -> list[tuple[set, bool]]:
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expression needs 5 fields, got {len(fields)}: {expr!r}")
    return [
        _parse_cron_field(f, lo, hi, names, norm)
        for f, (lo, hi, names, norm) in zip(fields, _CRON_FIELDS)
    ]


def next_cron_fire(expr: str, after: float) -> float:
    """Next fire time strictly after ``after`` (epoch seconds, local
    time). Day-level scan (≤ ~4 years for Feb-29 crons) then first
    matching (hour, minute) in the day. dom/dow semantics: when both
    are restricted, a day matches if EITHER does (cron standard)."""
    import datetime as dt

    (mins, _), (hrs, _), (dom, dom_wild), (mon, _), (dow, dow_wild) = parse_cron(expr)
    t = dt.datetime.fromtimestamp(after).replace(second=0, microsecond=0)
    t += dt.timedelta(minutes=1)
    day = t.date()
    for _ in range(366 * 4 + 2):
        if day.month in mon:
            dom_ok = day.day in dom
            dow_ok = day.isoweekday() % 7 in dow  # cron: 0=Sunday
            day_ok = (dom_ok or dow_ok) if (not dom_wild and not dow_wild) \
                else (dom_ok and dow_ok)
            if day_ok:
                start = t if day == t.date() else dt.datetime.combine(
                    day, dt.time(0, 0))
                for h in sorted(hrs):
                    if h < start.hour:
                        continue
                    for m in sorted(mins):
                        if h == start.hour and m < start.minute:
                            continue
                        return dt.datetime.combine(
                            day, dt.time(h, m)).timestamp()
        day += dt.timedelta(days=1)
    raise ValueError(f"cron expression never fires: {expr!r}")


def is_cron(trigger: str) -> bool:
    return len(trigger.strip().split()) == 5


class JobScheduler:
    def __init__(self, store_path: str):
        import threading

        self.store_path = store_path
        # daemon mode saves from pool threads concurrently with the poll
        # loop — serialize tmp-file writes or two json.dump calls
        # interleave into one tmp and os.replace installs corrupt JSON
        self._save_lock = threading.Lock()
        self.jobs: dict[str, dict[str, Any]] = {}
        if os.path.exists(store_path):
            with open(store_path) as f:
                self.jobs = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.store_path) or ".", exist_ok=True)
        tmp = self.store_path + ".tmp"
        with self._save_lock:
            with open(tmp, "w") as f:
                json.dump(self.jobs, f, indent=2)
            os.replace(tmp, self.store_path)

    def schedule_job(self, name: str, config_path: str, trigger: str,
                     email: Optional[str] = None,
                     webhook: Optional[str] = None) -> str:
        """``trigger``: either an interval ("every 5m", "2h", "45") or a
        5-field cron expression ("0 3 * * *") — the reference's
        ``--cron`` surface (job_scheduler.py:522-603). Both are
        validated here; invalid specs raise before anything persists."""
        now = time.time()
        if is_cron(trigger):
            parse_cron(trigger)  # validate
            interval = None
            next_run = next_cron_fire(trigger, now)
        else:
            interval = _parse_trigger(trigger)
            if interval <= 0:
                raise ValueError("trigger interval must be positive")
            next_run = now + interval
        job_id = uuid.uuid4().hex[:12]
        self.jobs[job_id] = {
            "job_id": job_id, "name": name, "config_path": config_path,
            "trigger": trigger, "interval_s": interval,
            "email": email, "webhook": webhook,
            "status": "scheduled", "created_at": now,
            "last_run": None, "last_status": None, "next_run": next_run,
        }
        self._save()
        return job_id

    def list_jobs(self) -> list[dict[str, Any]]:
        return sorted(self.jobs.values(), key=lambda j: j["created_at"])

    def get_job(self, job_id: str) -> Optional[dict[str, Any]]:
        return self.jobs.get(job_id)

    def remove_job(self, job_id: str) -> bool:
        if self.jobs.pop(job_id, None) is None:
            return False
        self._save()
        return True

    def due_jobs(self, now: Optional[float] = None) -> list[dict[str, Any]]:
        now = time.time() if now is None else now
        return [j for j in self.list_jobs() if j["next_run"] <= now]

    def _notify(self, job: dict, message: str) -> None:
        """Reference notification semantics (job_scheduler.py:259-484):
        webhook = requests.post JSON with job_id/name/status/timestamp
        (+error on failure); email = smtplib via WEBSCRAPER_SMTP_* env
        vars, silently skipped when credentials are absent. Sender
        errors are logged, never raised (reference swallows them). An
        audit line is always appended to notifications.log — also the
        deterministic test surface."""
        log = os.path.join(os.path.dirname(self.store_path) or ".",
                           "notifications.log")
        status = job.get("last_status") or "unknown"
        payload = {
            "job_id": job["job_id"], "job_name": job["name"],
            "status": status, "timestamp": time.time(),
        }
        if status != "success":
            payload["error"] = message
        with open(log, "a") as f:
            for channel in ("email", "webhook"):
                if not job.get(channel):
                    continue
                sent, err = False, None
                try:
                    if channel == "webhook":
                        sent = self._send_webhook(job["webhook"], payload)
                    else:
                        sent = self._send_email(job["email"], payload)
                except Exception as e:  # reference logs and continues
                    err = f"{type(e).__name__}: {e}"
                f.write(json.dumps({"ts": time.time(), "channel": channel,
                                    "to": job[channel], "job": job["job_id"],
                                    "message": message, "sent": sent,
                                    "error": err}) + "\n")

    @staticmethod
    def _send_webhook(url: str, payload: dict) -> bool:
        import requests

        resp = requests.post(url, json=payload,
                             headers={"Content-Type": "application/json"},
                             timeout=10)
        return 200 <= resp.status_code < 300

    @staticmethod
    def _send_email(to: str, payload: dict) -> bool:
        import smtplib
        from email.mime.text import MIMEText

        server = os.environ.get("WEBSCRAPER_SMTP_SERVER", "smtp.gmail.com")
        port = int(os.environ.get("WEBSCRAPER_SMTP_PORT", "587"))
        user = os.environ.get("WEBSCRAPER_SMTP_USERNAME")
        password = os.environ.get("WEBSCRAPER_SMTP_PASSWORD")
        if not user or not password:
            return False  # reference: warn + skip without credentials
        ok = payload["status"] == "success"
        msg = MIMEText(
            f"<html><body><h2>Web Scraper Job "
            f"{'Completed Successfully' if ok else 'Failed'}</h2>"
            f"<p><b>Job ID:</b> {payload['job_id']}</p>"
            f"<p><b>Job Name:</b> {payload['job_name']}</p>"
            f"<p><b>Status:</b> {payload['status']}</p></body></html>",
            "html",
        )
        msg["From"], msg["To"] = user, to
        msg["Subject"] = (
            f"Web Scraper Job '{payload['job_name']}' "
            + ("Completed Successfully" if ok else "Failed")
        )
        with smtplib.SMTP(server, port) as s:
            s.starttls()
            s.login(user, password)
            s.send_message(msg)
        return True

    def run_job(self, job_id: str, extra_args: Optional[list[str]] = None,
                now: Optional[float] = None) -> dict[str, Any]:
        """One fire = one engine subprocess (the `ray job submit` analog)."""
        job = self.jobs[job_id]
        cmd = [sys.executable, "-m", "web_scrapper_ray.cli", "scrape",
               "--config", job["config_path"], *(extra_args or [])]
        result = subprocess.run(cmd, capture_output=True, text=True)
        now = time.time() if now is None else now
        job["last_run"] = now
        job["last_status"] = "success" if result.returncode == 0 else "failed"
        # reschedule from NOW: a job that missed several fires while the
        # runner was down catches up with ONE run (APScheduler's default
        # coalescing), then resumes its normal cadence
        if job.get("interval_s"):
            job["next_run"] = now + job["interval_s"]
        else:
            job["next_run"] = next_cron_fire(job["trigger"], now)
        self._save()
        self._notify(job, f"job {job['name']} finished: {job['last_status']}")
        return {"returncode": result.returncode, "stdout": result.stdout[-2000:],
                "stderr": result.stderr[-2000:]}

    def run_due(self, now: Optional[float] = None, **kw) -> list[str]:
        ran = []
        for job in self.due_jobs(now):
            self.run_job(job["job_id"], now=now, **kw)
            ran.append(job["job_id"])
        return ran

    def run_daemon(self, poll_s: float = 1.0, max_instances: int = 3,
                   max_ticks: Optional[int] = None, runner=None,
                   pool_size: int = 10) -> dict[str, int]:
        """Long-lived scheduler loop — the reference's APScheduler
        ``BackgroundScheduler`` surface (job_scheduler.py:64-75:
        ThreadPoolExecutor(10), ``max_instances: 3``, coalescing).

        Polls ``due_jobs`` every ``poll_s`` and fires each due job on a
        thread pool. Overlap control matches APScheduler: a job with
        ``max_instances`` executions still running has its fire SKIPPED
        (counted, not queued). ``next_run`` advances at SUBMIT time so
        one due event fires exactly once even while a slow run is in
        flight (the completion-time reschedule inside ``run_job`` then
        keeps the steady-state cadence). ``max_ticks`` bounds the loop
        for tests / supervised runs; None runs until interrupted.
        ``runner`` overrides the per-fire callable (tests)."""
        from concurrent.futures import ThreadPoolExecutor

        runner = runner or self.run_job
        inflight: dict[str, list] = {}
        fired = skipped = ticks = errors = 0

        def reap(futures: list) -> list:
            """Drop finished futures, surfacing (never swallowing) their
            exceptions — a raising runner must be visible in the audit
            log and the returned stats, as run-due mode would raise."""
            nonlocal errors
            live = []
            for f in futures:
                if not f.done():
                    live.append(f)
                    continue
                exc = f.exception()
                if exc is not None:
                    errors += 1
                    log = os.path.join(
                        os.path.dirname(self.store_path) or ".",
                        "notifications.log")
                    with open(log, "a") as fh:
                        fh.write(json.dumps({
                            "ts": time.time(), "channel": "daemon",
                            "error": f"{type(exc).__name__}: {exc}",
                        }) + "\n")
            return live

        with ThreadPoolExecutor(pool_size) as pool:
            while max_ticks is None or ticks < max_ticks:
                ticks += 1
                for job in self.due_jobs():
                    jid = job["job_id"]
                    live = reap(inflight.get(jid, []))
                    inflight[jid] = live
                    if len(live) >= max_instances:
                        skipped += 1
                        continue
                    now = time.time()
                    if job.get("interval_s"):
                        job["next_run"] = now + job["interval_s"]
                    else:
                        job["next_run"] = next_cron_fire(job["trigger"], now)
                    self._save()
                    inflight[jid].append(pool.submit(runner, jid))
                    fired += 1
                time.sleep(poll_s)
        # pool shutdown waited for stragglers — reap their outcomes too
        for futures in inflight.values():
            reap(futures)
        return {"ticks": ticks, "fired": fired, "skipped": skipped,
                "errors": errors}
