"""Catch the driver in the act during inter-job gaps: run one flagship
profile level while sampling jstack + jstat -gcutil of the JVM, then
print the samples that fall inside the biggest no-job-running gap.

Usage: python scripts/gap_stacks.py [cores]   (default 8)
Writes /tmp/gap_stacks/ samples; prints correlated summary.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = "/tmp/gap_stacks"
EVENTDIR = "/tmp/kg_profile_events"
JBIN = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin")


def find_jvm(exclude: set[int]) -> int | None:
    out = subprocess.run(["pgrep", "-f", "java"], capture_output=True,
                         text=True).stdout.split()
    pids = [int(p) for p in out if int(p) not in exclude]
    return pids[0] if pids else None


def sampler(stop: threading.Event, pid: int) -> None:
    i = 0
    while not stop.is_set():
        ts = time.time()
        r = subprocess.run([f"{JBIN}/jstack", str(pid)], capture_output=True,
                           text=True, timeout=10)
        g = subprocess.run([f"{JBIN}/jstat", "-gcutil", str(pid)],
                           capture_output=True, text=True, timeout=10)
        with open(f"{OUTDIR}/sample_{i:04d}.txt", "w") as f:
            f.write(f"TS_MS {int(ts * 1000)}\n")
            f.write(g.stdout)
            f.write(r.stdout)
        i += 1
        time.sleep(0.15)


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shutil.rmtree(OUTDIR, ignore_errors=True)
    os.makedirs(OUTDIR)
    exclude = {int(p) for p in subprocess.run(
        ["pgrep", "-f", "java"], capture_output=True,
        text=True).stdout.split()}
    cmd = [sys.executable, "scripts/profile_flagship.py", "--run",
           str(cores)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))
    pid = None
    while pid is None and proc.poll() is None:
        time.sleep(0.5)
        pid = find_jvm(exclude)
    print("sampling jvm pid", pid)
    stop = threading.Event()
    t = threading.Thread(target=sampler, args=(stop, pid), daemon=True)
    t.start()
    out, _ = proc.communicate(timeout=1800)
    stop.set()
    t.join(timeout=5)
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    print("wall", res["wall_s"], "app", res["app_id"])

    # locate gaps in the measured window
    jobs = {}
    for ln in open(os.path.join(EVENTDIR, res["app_id"])):
        ev = json.loads(ln)
        if ev.get("Event") == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = [ev["Submission Time"], None]
        elif ev.get("Event") == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]][1] = ev["Completion Time"]
    iv = sorted(v for v in jobs.values()
                if v[1] and v[0] >= res["t0_ms"])
    gaps = []
    cur = iv[0][1]
    for s, e in iv[1:]:
        if s > cur + 300:
            gaps.append((cur, s))
        if e > cur:
            cur = e
    print("gaps:", [(round((b - a) / 1e3, 2)) for a, b in gaps])
    with open(f"{OUTDIR}/gaps.json", "w") as f:
        json.dump({"gaps": gaps, "window": [res["t0_ms"], res["t1_ms"]]}, f)

    # correlate: which samples landed inside the biggest gap
    if not gaps:
        return 0
    big = max(gaps, key=lambda g: g[1] - g[0])
    print(f"biggest gap {round((big[1]-big[0])/1e3,2)}s "
          f"[{big[0]}..{big[1]}]")
    for p in sorted(glob.glob(f"{OUTDIR}/sample_*.txt")):
        ts = int(open(p).readline().split()[1])
        if big[0] <= ts <= big[1]:
            print("  in-gap sample:", p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
