"""Job-scheduler surface (ST5 analog; out-of-dataplane per north rule)."""

import json

from web_scrapper_ray.schedulers import JobScheduler, _parse_trigger


def test_parse_trigger():
    assert _parse_trigger("every 5m") == 300
    assert _parse_trigger("2h") == 7200
    assert _parse_trigger("every 30s") == 30
    assert _parse_trigger("45") == 45


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
