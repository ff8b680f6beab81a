"""Wedge-proof, resumable benchmark-queue runner (VERDICT round 3 #2).

The round-3 measurement program was lost to a TPU relay wedge because the
watcher/queue machinery lived in /tmp as one monolithic shell script: a
mid-queue wedge meant rerunning 1500-step trains from scratch. This runner
is the in-repo replacement:

  * queue items are declared in `queues.py` with names, env class (tpu/cpu),
    timeouts and retry counts;
  * each completed item writes a JSON done-marker under
    `runs/queue_state/<queue>/<item>.done`, so a relaunch (after a kill, a
    wedge, or a reboot) resumes at the first unfinished item;
  * before every TPU item the chip is probed with a tiny matmul and the
    runner BLOCKS until the probe answers (a hanging probe completes the
    moment the relay recovers — see CLAUDE.md "Chip-claim wedge");
  * a wedge *during* an item (timeout, "device unreachable", or a stalled
    log with ~zero child CPU) is classified and the item retried after the
    next successful probe, instead of poisoning the rest of the queue.

The runner itself must NOT claim the TPU chip (every python process with
PALLAS_AXON_POOL_IPS set claims it at interpreter start), so launch it via
`run_queue.sh`, which clears the variable for the runner and passes the
real value through TPU_POOL_IPS_REAL for the children.

Usage:
    bash tools/bench_queue/run_queue.sh <queue-name> [--retry-failed]
    bash tools/bench_queue/run_queue.sh <queue-name> --list
"""

import argparse
import json
import os
import shlex
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
STATE_ROOT = os.path.join(REPO, "runs", "queue_state")

PROBE_SRC = (
    "import jax\n"
    "x = jax.numpy.ones((8, 8))\n"
    "print('CHIP OK', float((x @ x).sum()), flush=True)\n"
)


def _tpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = env.get("TPU_POOL_IPS_REAL", "127.0.0.1")
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    return env


def _cpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    return env


def _log(msg):
    print(f"[run_queue {time.strftime('%H:%M:%S')}] {msg}", flush=True)


_ACTIVE_CHILD = [None]  # pgid leader of the in-flight item, for SIGTERM cleanup


def _on_sigterm(signum, frame):
    proc = _ACTIVE_CHILD[0]
    if proc is not None:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    raise SystemExit(143)


def _run_with_timeout(cmd, env, timeout, log_path=None, stall_secs=None):
    """Run `cmd` in its own process group; kill the whole group on timeout.

    Returns (rc, reason) where reason is 'ok', 'timeout', or 'stall'.
    A 'stall' is a wedge signature: the item's log stopped growing AND the
    child accumulated ~no CPU over the stall window (CLAUDE.md).
    """
    proc = subprocess.Popen(
        ["bash", "-c", cmd], env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    _ACTIVE_CHILD[0] = proc
    try:
        deadline = time.time() + timeout
        last_size, last_change, last_cpu = -1, time.time(), 0.0
        while True:
            try:
                rc = proc.wait(timeout=min(20.0, max(0.5, deadline - time.time())))
                return rc, "ok"
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            if now > deadline:
                _kill_group(proc)
                return 124, "timeout"
            if log_path and stall_secs:
                size = os.path.getsize(log_path) if os.path.exists(log_path) else -1
                if size != last_size:
                    last_size, last_change = size, now
                elif now - last_change > stall_secs:
                    cpu = _group_cpu_seconds(proc.pid)
                    if cpu - last_cpu < 2.0:  # ~zero CPU over the stall window
                        _kill_group(proc)
                        return 125, "stall"
                    last_cpu, last_change = cpu, now  # busy but quiet: keep waiting
    finally:
        _ACTIVE_CHILD[0] = None


def _group_cpu_seconds(pgid_leader):
    """Total utime+stime (seconds) of every process in the leader's group."""
    total = 0.0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                if int(parts[2]) == pgid_leader:  # field 5 (pgrp), 3rd after comm
                    total += (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
            except (OSError, ValueError, IndexError):
                continue
    except OSError:
        pass
    return total


def _kill_group(proc):
    try:
        os.killpg(proc.pid, signal.SIGTERM)
        time.sleep(5)
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass


class DeadlineReached(Exception):
    """The runner's --deadline-epoch passed while waiting for the chip."""


# The loopback relay (/root/.tpu_init.py) listens on these; the axon
# client dials 127.0.0.1:<port> and jaxlib retries connects at ~1/s.
RELAY_PORTS = (8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107,
               8112, 8113, 8117)


def relay_listener_up():
    """True if anything is LISTENing on a TPU relay port (/proc/net/tcp).

    Distinguishes the two wedge modes observed so far (2026-08-18):
      * FAR-END WEDGE (round 3): relay alive, request forwarded, no reply
        — probe blocks in tcp_recvmsg on an ESTAB connection.
      * RELAY DEAD (round 4): /root/.tpu_init.py exited (it os._exit(0)s
        on stdin EOF when the host-side orchestrator drops); nothing
        listens, the probe sleep-retries connect forever.  Only the host
        harness can respawn the relay — in-container recovery is
        impossible, but a hanging probe still catches a respawn within
        ~1 s via the client's connect-retry loop.
    """
    want = {f"{p:04X}" for p in RELAY_PORTS}
    try:
        with open("/proc/net/tcp") as f:
            for line in f.readlines()[1:]:
                parts = line.split()
                # local_address "0100007F:1FB5", st 0A == LISTEN
                addr = parts[1].split(":")
                if len(addr) == 2 and addr[1] in want and parts[3] == "0A":
                    return True
    except OSError:
        pass
    return False


def probe_chip(probe_timeout=900, sleep_between=30, max_attempts=None,
               give_up_at=None):
    """Block until the TPU answers a tiny matmul. Returns attempts used.

    Under a relay wedge the probe HANGS rather than erroring, and completes
    the moment the far end recovers — so a long per-probe timeout doubles as
    the recovery wait (CLAUDE.md "Chip-claim wedge").  ``give_up_at`` is an
    absolute epoch: past it, raise :class:`DeadlineReached` instead of
    starting another probe (the caller's item no longer fits before the
    runner's deadline).
    """
    attempt = 0
    while True:
        attempt += 1
        if give_up_at is not None and time.time() > give_up_at:
            raise DeadlineReached()
        if os.path.exists(os.path.join(STATE_ROOT, "STOP")):
            raise SystemExit("STOP sentinel present; abandoning chip probe")
        cmd = f"python -c {shlex.quote(PROBE_SRC)} > /tmp/queue_probe.log 2>&1"
        rc, _ = _run_with_timeout(cmd, _tpu_env(), probe_timeout)
        ok = rc == 0
        try:
            with open("/tmp/queue_probe.log") as f:
                ok = ok and "CHIP OK" in f.read()
        except OSError:
            ok = False
        if ok:
            _log(f"chip answered on probe attempt {attempt}")
            return attempt
        mode = "far-end wedge" if relay_listener_up() else "relay DEAD"
        _log(f"probe attempt {attempt} failed (rc={rc}); "
             f"chip still wedged [{mode}]")
        if max_attempts and attempt >= max_attempts:
            raise RuntimeError(f"chip never answered in {attempt} probes")
        time.sleep(sleep_between)


WEDGE_MARKERS = ("device unreachable", "DEADLINE_EXCEEDED", "did not answer")


def _looks_wedged(reason, log_path):
    if reason in ("timeout", "stall"):
        return True
    if log_path and os.path.exists(log_path):
        try:
            with open(log_path, errors="replace") as f:
                tail = f.read()[-20000:]
            return any(m in tail for m in WEDGE_MARKERS)
        except OSError:
            pass
    return False


def run_item(item, state_dir, cooldown=45, deadline=None):
    """True = done, False = failed (marker written), None = deferred
    (deadline would be crossed, or an input from an earlier deferred item
    is missing; no marker either way, a relaunch picks it up)."""
    name = item["name"]
    done_path = os.path.join(state_dir, f"{name}.done")
    fail_path = os.path.join(state_dir, f"{name}.fail")
    missing = [p for p in item.get("requires", ()) if not os.path.exists(p)]
    if missing:
        # Typical case: a CPU item consuming artifacts of a TPU item that
        # was itself deferred past the deadline.  Running it would fail
        # and write a .fail marker that blocks the next auto-resume.
        _log(f"item {name}: deferred (missing inputs: {', '.join(missing)})")
        return None
    retries = item.get("retries", 2)
    log_path = item.get("log")
    is_tpu = item.get("tpu", True)
    env = _tpu_env() if is_tpu else _cpu_env()
    # CPU items never hold the chip; only TPU items respect the deadline.
    start_by = (
        deadline - item["timeout"] if deadline is not None and is_tpu else None
    )

    for attempt in range(1, retries + 2):
        if start_by is not None and time.time() > start_by:
            _log(f"item {name}: deferred (would hold the chip past the "
                 f"deadline); no marker written")
            return None
        if is_tpu:
            try:
                probe_chip(give_up_at=start_by)
            except DeadlineReached:
                _log(f"item {name}: deferred (deadline reached while "
                     f"waiting for the chip)")
                return None
        _log(f"item {name}: attempt {attempt} starting "
             f"(timeout {item['timeout']}s, log {log_path or '-'})")
        t0 = time.time()
        # stall_secs is OPT-IN per item: remote compiles are quiet with
        # ~zero local CPU for minutes (the compile runs on the far end),
        # so a default-on stall kill would shoot healthy long-compile
        # items (bench, measure_baked).  Only items that log frequently
        # once running (train loops) set it.
        rc, reason = _run_with_timeout(
            item["cmd"], env, item["timeout"], log_path=log_path,
            stall_secs=item.get("stall_secs") if item.get("tpu", True) else None,
        )
        secs = time.time() - t0
        if rc == 0:
            record = {"rc": 0, "secs": round(secs, 1), "attempt": attempt,
                      "finished": time.strftime("%Y-%m-%dT%H:%M:%S")}
            with open(done_path, "w") as f:
                json.dump(record, f)
            if os.path.exists(fail_path):
                os.unlink(fail_path)
            _log(f"item {name}: DONE in {secs:.0f}s")
            if item.get("tpu", True):
                time.sleep(cooldown)  # let the chip claim release
            return True
        wedged = _looks_wedged(reason, log_path)
        _log(f"item {name}: attempt {attempt} failed rc={rc} reason={reason} "
             f"wedge={wedged} after {secs:.0f}s")
        if item.get("tpu", True):
            time.sleep(cooldown)
        if not wedged and attempt > 1:
            break  # real failure, already retried once — move on
    with open(fail_path, "w") as f:
        json.dump({"rc": rc, "reason": reason,
                   "finished": time.strftime("%Y-%m-%dT%H:%M:%S")}, f)
    _log(f"item {name}: FAILED (marker written); continuing with the queue")
    return False


def acquire_lock(state_dir):
    lock = os.path.join(state_dir, "runner.lock")
    if os.path.exists(lock):
        try:
            with open(lock) as f:
                pid = int(f.read().strip())
            os.kill(pid, 0)
            raise SystemExit(f"another runner (pid {pid}) holds {lock}")
        except (ValueError, ProcessLookupError):
            _log("reclaiming stale lock")
        except PermissionError:
            raise SystemExit(f"another runner holds {lock}")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    return lock


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("queue", help="queue name from queues.py")
    p.add_argument("--retry-failed", action="store_true",
                   help="also rerun items with a .fail marker")
    p.add_argument("--deadline-epoch", type=float, default=None,
                   help="unix epoch after which no TPU item may still be "
                   "running (items whose timeout would cross it are "
                   "deferred, unmarked, for a later relaunch; CPU items "
                   "are exempt) — keeps the chip free for the driver's "
                   "round-end bench.py")
    p.add_argument("--list", action="store_true", help="print item status and exit")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import queues  # noqa: E402
    items = queues.QUEUES[args.queue]

    state_dir = os.path.join(STATE_ROOT, args.queue)
    os.makedirs(state_dir, exist_ok=True)

    if args.list:
        for it in items:
            done = os.path.exists(os.path.join(state_dir, f"{it['name']}.done"))
            fail = os.path.exists(os.path.join(state_dir, f"{it['name']}.fail"))
            print(f"{'DONE' if done else 'FAIL' if fail else 'todo':5} {it['name']}")
        return 0

    signal.signal(signal.SIGTERM, _on_sigterm)
    lock = acquire_lock(state_dir)
    try:
        os.chdir(REPO)
        stop_sentinel = os.path.join(STATE_ROOT, "STOP")
        n_done = n_fail = n_skip = n_defer = 0
        for it in items:
            if os.path.exists(stop_sentinel):
                # Graceful drain: finish nothing more, release the chip
                # (e.g. ahead of the driver's round-end bench.py run,
                # which would otherwise queue behind a 1500-step train).
                _log(f"STOP sentinel {stop_sentinel} present; exiting "
                     f"before item {it['name']}")
                break
            done = os.path.join(state_dir, f"{it['name']}.done")
            fail = os.path.join(state_dir, f"{it['name']}.fail")
            if os.path.exists(done):
                # A durable done marker can outlive volatile outputs (e.g.
                # /tmp artifacts after a reboot).  Skipping then would
                # strand every consumer in its missing-`requires` defer
                # forever, so rerun the producer instead.
                gone = [p for p in it.get("produces", ())
                        if not os.path.exists(p)]
                if not gone:
                    n_skip += 1
                    continue
                _log(f"item {it['name']}: done marker present but outputs "
                     f"missing ({', '.join(gone)}) — rerunning")
                os.unlink(done)
            if os.path.exists(fail) and not args.retry_failed:
                _log(f"item {it['name']}: has .fail marker, skipping "
                     f"(use --retry-failed)")
                n_fail += 1
                continue
            got = run_item(it, state_dir, deadline=args.deadline_epoch)
            if got is None:
                n_defer += 1
            elif got:
                n_done += 1
            else:
                n_fail += 1
        _log(f"queue {args.queue} complete: {n_done} ran, {n_skip} already done, "
             f"{n_fail} failed, {n_defer} deferred")
        return 0 if n_fail == 0 else 1
    finally:
        os.unlink(lock)


if __name__ == "__main__":
    raise SystemExit(main())
