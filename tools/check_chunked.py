#!/usr/bin/env python3
"""Run tools/check.py over the full declared inventory in CHUNKS, one
fresh subprocess (= one fresh DuckDB connection) per chunk.

Why: a single DuckDB connection accumulates memory across consecutive
multi-10M-row oracle compares and eventually OOMs on a tiny allocation
(observed ~13 big queries in at the 100x corpus). Chunking bounds the
per-connection work.

Adaptive sizing (r11 verdict task 8): a chunk whose subprocess DIES
mid-way (OOM-kill, disk-full — the infra failure mode this tool
mitigates, 19 manual retries in the r11 check_sf10_full run) is not
failed outright; it is SPLIT IN HALF and both halves re-queued, down to
single-query chunks. Only a query that dies alone in its own process is
a real failure — so the 100x gate reruns hands-off. Genuine FAIL
verdicts (oracle mismatch) are never retried: the compare ran, the
answer stands. Usage:
    python3 tools/check_chunked.py <sfDir> <verifyOutDir> [chunkSize]
(Developer tooling only — the driver's own gate runs at sf0.01 where a
single connection is fine.)"""
import json
import subprocess
import sys
from collections import deque


# A FAIL whose reason is resource exhaustion is an INFRA casualty, not an
# oracle verdict: DuckDB can throw a clean Out of Memory / disk-full error
# instead of dying (the process survives, so the missing-verdict detector
# below never fires). Those must requeue like dead chunks — the compare
# never actually ran to an answer. A genuine mismatch (rows/columns/
# differing rows) is never retried.
INFRA_FAIL = ("Out of Memory", "bad allocation", "No space left",
              "out of disk", "max_temp_directory_size", "Failed to allocate")


def run_chunk(sf_dir, out_dir, part):
    """One fresh check.py process over `part`; returns (verdicts, rc, err)
    where verdicts maps query -> True (OK) / False (FAIL line printed);
    infra-casualty FAILs are excluded from verdicts so they requeue."""
    r = subprocess.run(
        [sys.executable, "tools/check.py", sf_dir, out_dir] + part,
        capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stdout.flush()
    verdicts = {}
    for line in r.stdout.splitlines():
        if line.startswith("OK "):
            verdicts[line.split()[1].rstrip(":")] = True
        elif line.startswith("FAIL"):
            name = line.split()[1].rstrip(":")
            if any(s in line for s in INFRA_FAIL):
                sys.stdout.write(f"!! infra casualty (will requeue): {name}\n")
            else:
                verdicts[name] = False
    return verdicts, r.returncode, r.stderr.strip()[-300:]


def main(sf_dir, out_dir, chunk=25, only=()):
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    if only:
        names = [n for n in names if n in set(only)]
    ok = bad = 0
    failed = []
    splits = 0
    queue = deque(names[i:i + chunk] for i in range(0, len(names), chunk))
    while queue:
        part = queue.popleft()
        verdicts, rc, err = run_chunk(sf_dir, out_dir, part)
        for n in part:
            if n in verdicts:
                if verdicts[n]:
                    ok += 1
                else:
                    bad += 1
                    failed.append(n)
        # Queries with no verdict line mean the process died mid-chunk
        # (counting only printed lines would leave bad == 0 — a
        # false-green). Halve and requeue so the rerun is hands-off; a
        # single query that still dies alone is a genuine failure.
        missing = [n for n in part if n not in verdicts]
        if missing:
            sys.stdout.write(f"!! chunk of {len(part)} incomplete rc={rc}: {err}\n")
            # Only a query that ran ALONE in its own fresh process and still
            # got no clean verdict is a genuine failure — a casualty in a
            # multi-query chunk may just have inherited its siblings'
            # accumulated memory, so it requeues (possibly as a singleton).
            if len(part) == 1:
                sys.stdout.write(
                    f"FAIL {missing[0]}: no clean verdict in a 1-query chunk "
                    f"(died or resource-failed alone)\n")
                bad += 1
                failed.append(missing[0])
            else:
                half = (len(missing) + 1) // 2
                for piece in (missing[half:], missing[:half]):
                    if piece:
                        queue.appendleft(piece)
                splits += 1
                sys.stdout.write(
                    f"!! requeued as {half}+{len(missing) - half} "
                    f"(adaptive split #{splits})\n")
    print(f"== TOTAL {ok} ok, {bad} fail"
          + (f" ({splits} adaptive splits)" if splits else ""))
    if failed:
        print("failed:", " ".join(failed))
    return 1 if bad else 0


if __name__ == "__main__":
    cs = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    sys.exit(main(sys.argv[1], sys.argv[2], cs, tuple(sys.argv[4:])))
