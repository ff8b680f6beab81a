"""Tests for the wedge-proof benchmark queue runner (tools/bench_queue).

The runner must survive a kill/wedge/reboot cycle and complete only the
unfinished queue items (VERDICT round 3 #2). These tests exercise the
resume/skip/fail-marker state machine and the process-group kill with
CPU-only fake commands — no chip, no jax.
"""

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "bench_queue"))

import run_queue  # noqa: E402


def _item(name, cmd, timeout=30, **kw):
    return dict(name=name, cmd=cmd, tpu=False, timeout=timeout, **kw)


def test_done_marker_written_and_item_skipped_on_rerun(tmp_path):
    touch = tmp_path / "ran"
    item = _item("a", f"echo once >> {touch}")
    assert run_queue.run_item(item, str(tmp_path))
    done = json.loads((tmp_path / "a.done").read_text())
    assert done["rc"] == 0 and done["attempt"] == 1
    assert touch.read_text().count("once") == 1


def test_failure_writes_fail_marker_and_reports_false(tmp_path):
    item = _item("bad", "exit 3", retries=0)
    assert not run_queue.run_item(item, str(tmp_path))
    fail = json.loads((tmp_path / "bad.fail").read_text())
    assert fail["rc"] == 3
    assert not (tmp_path / "bad.done").exists()


def test_success_after_failure_clears_fail_marker(tmp_path):
    (tmp_path / "c.fail").write_text("{}")
    assert run_queue.run_item(_item("c", "true"), str(tmp_path))
    assert (tmp_path / "c.done").exists()
    assert not (tmp_path / "c.fail").exists()


def test_timeout_kills_whole_process_group(tmp_path):
    pidfile = tmp_path / "child.pid"
    # The inner sleep is a grandchild; a naive kill of bash leaks it.
    cmd = f"(sleep 300 & echo $! > {pidfile}; wait)"
    t0 = time.time()
    rc, reason = run_queue._run_with_timeout(cmd, dict(os.environ), timeout=2)
    assert reason == "timeout" and rc == 124
    assert time.time() - t0 < 60
    for _ in range(50):
        time.sleep(0.1)
        if pidfile.exists():
            break
    pid = int(pidfile.read_text().strip())
    time.sleep(0.5)
    with pytest.raises(ProcessLookupError):
        os.kill(pid, 0)  # grandchild must be dead too


def test_wedge_classification_from_log_markers(tmp_path):
    log = tmp_path / "x.log"
    log.write_text("... RuntimeError: device unreachable: first device op ...")
    assert run_queue._looks_wedged("ok", str(log))
    log.write_text("ordinary traceback")
    assert not run_queue._looks_wedged("ok", str(log))
    assert run_queue._looks_wedged("timeout", None)
    assert run_queue._looks_wedged("stall", None)


def test_lock_rejects_live_holder_and_reclaims_stale(tmp_path):
    lock = tmp_path / "runner.lock"
    lock.write_text(str(os.getpid()))  # a live pid: refuse
    with pytest.raises(SystemExit):
        run_queue.acquire_lock(str(tmp_path))
    lock.write_text("99999999")  # dead pid: reclaim
    got = run_queue.acquire_lock(str(tmp_path))
    assert json.loads(json.dumps(int(open(got).read()))) == os.getpid()
    os.unlink(got)


def test_deadline_defers_tpu_items_without_markers(tmp_path, monkeypatch):
    """--deadline-epoch: a TPU item whose timeout crosses the deadline is
    deferred with NO marker (a relaunch picks it up); CPU items are
    exempt; a fitting TPU item still runs."""
    # TPU env must not touch the real chip: stub the probe.
    monkeypatch.setattr(run_queue, "probe_chip", lambda **kw: 1)
    past = time.time() + 5  # only items with timeout < 5s fit

    ran = tmp_path / "ran"
    long_tpu = dict(name="long", cmd=f"echo long >> {ran}", tpu=True,
                    timeout=3600)
    short_tpu = dict(name="short", cmd=f"echo short >> {ran}", tpu=True,
                     timeout=1, retries=0)
    cpu = dict(name="cpu", cmd=f"echo cpu >> {ran}", tpu=False, timeout=3600)

    assert run_item_res(long_tpu, tmp_path, past) is None
    assert not (tmp_path / "long.done").exists()
    assert not (tmp_path / "long.fail").exists()
    assert run_item_res(short_tpu, tmp_path, past) is True
    assert run_item_res(cpu, tmp_path, past) is True
    assert ran.read_text().splitlines() == ["short", "cpu"]


def run_item_res(item, tmp_path, deadline):
    return run_queue.run_item(item, str(tmp_path), cooldown=0,
                              deadline=deadline)


def test_done_marker_with_missing_produces_reruns(tmp_path):
    """A durable done marker whose declared outputs vanished (e.g. /tmp
    cleared by a reboot) must rerun the producer, or every consumer's
    missing-`requires` defer strands the queue forever."""
    out = tmp_path / "vol" / "artifact.pkl"
    out.parent.mkdir()
    qdir = tmp_path / "repo" / "tools" / "q"
    qdir.mkdir(parents=True)
    spec = f"""
QUEUES = {{"t": [
    dict(name="prod", cmd="echo x >> {out}", tpu=False, timeout=30,
         produces=["{out}"]),
]}}
"""
    (qdir / "queues.py").write_text(spec)
    (qdir / "run_queue.py").write_text(
        open(os.path.join(os.path.dirname(run_queue.__file__),
                          "run_queue.py")).read()
    )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    run = lambda: subprocess.run(
        [sys.executable, str(qdir / "run_queue.py"), "t"],
        env=env, capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert run().returncode == 0
    assert out.read_text() == "x\n"
    assert run().returncode == 0  # outputs intact: skipped
    assert out.read_text() == "x\n"
    out.unlink()  # "reboot": volatile output gone, marker still there
    r = run()
    assert r.returncode == 0 and "rerunning" in r.stdout
    assert out.read_text() == "x\n"


def test_missing_requires_defers_without_marker(tmp_path):
    """An item whose `requires` inputs are absent (e.g. a PSNR check on
    renders from a deferred TPU item) defers with NO marker instead of
    failing — a .fail marker would block the next auto-resume."""
    ran = tmp_path / "ran"
    need = tmp_path / "input.png"
    item = _item("psnr", f"echo ran >> {ran}", requires=[str(need)])
    assert run_queue.run_item(item, str(tmp_path)) is None
    assert not ran.exists()
    assert not (tmp_path / "psnr.done").exists()
    assert not (tmp_path / "psnr.fail").exists()
    need.write_text("")  # input appears (producer item ran): now runs
    assert run_queue.run_item(item, str(tmp_path)) is True
    assert ran.read_text() == "ran\n"


def test_probe_chip_gives_up_at_deadline(monkeypatch):
    # No probe subprocess must run: give_up_at already passed.
    monkeypatch.setattr(
        run_queue, "_run_with_timeout",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed")),
    )
    with pytest.raises(run_queue.DeadlineReached):
        run_queue.probe_chip(give_up_at=time.time() - 1)


def test_end_to_end_resume_via_cli(tmp_path, monkeypatch):
    """Run a 3-item queue, fail the middle item, rerun: only it retries."""
    # Two levels deep so the runner's derived repo root (three dirname()s
    # up from its own file) stays INSIDE tmp_path — its runs/queue_state
    # tree must not leak into pytest's session-shared basetemp.
    qdir = tmp_path / "repo" / "tools" / "q"
    qdir.mkdir(parents=True)
    counts = tmp_path / "counts"
    spec = f"""
QUEUES = {{"t": [
    dict(name="one", cmd="echo one >> {counts}", tpu=False, timeout=30),
    dict(name="two", cmd="echo two >> {counts}; exit 1", tpu=False,
         timeout=30, retries=0),
    dict(name="three", cmd="echo three >> {counts}", tpu=False, timeout=30),
]}}
"""
    (qdir / "queues.py").write_text(spec)
    for src in ("run_queue.py",):
        (qdir / src).write_text(
            open(os.path.join(os.path.dirname(run_queue.__file__), src)).read()
        )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    run = lambda *extra: subprocess.run(
        [sys.executable, str(qdir / "run_queue.py"), "t", *extra],
        env=env, capture_output=True, text=True, cwd=str(tmp_path),
    )
    r1 = run()
    assert r1.returncode == 1, r1.stdout + r1.stderr
    assert counts.read_text().splitlines() == ["one", "two", "three"]
    r2 = run()  # without --retry-failed: nothing reruns
    assert counts.read_text().splitlines() == ["one", "two", "three"]
    assert "1 failed" in r2.stdout
    r3 = run("--retry-failed")  # only the failed item reruns
    assert counts.read_text().splitlines() == ["one", "two", "three", "two"]
    lst = run("--list")
    assert "FAIL  two" in lst.stdout and "DONE  one" in lst.stdout

    # STOP sentinel: a rerun drains immediately, executing nothing (used
    # to free the chip for the driver's round-end bench without killing a
    # mid-train item).
    stop = tmp_path / "repo" / "runs" / "queue_state" / "STOP"
    stop.write_text("")
    r4 = run("--retry-failed")
    assert "STOP sentinel" in r4.stdout
    assert counts.read_text().splitlines() == ["one", "two", "three", "two"]
