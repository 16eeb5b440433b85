"""Kill-and-resume scale smoke (north rule: a killed `ray job submit`
run resumes from checkpoint without re-fetching). Phase 1 crawls the
bench corpus with periodic checkpoints and is SIGKILLed mid-run from a
watcher thread; phase 2 resumes in a FRESH process and finishes; the
final seen set and visit log are compared against an uninterrupted
reference run.

Usage: python scripts/scale_smoke_resume.py [n_rows] [max_pages]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "--child":
    N_ROWS, MAX_PAGES = int(sys.argv[4]), int(sys.argv[5])
else:
    N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    MAX_PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
BATCH = 8192  # small windows => many checkpoints => a mid-run kill lands
SEEDS = 4096


def _engine(run_dir: str):
    import bench

    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec

    spec = bench.bench_spec(N_ROWS)

    def outlinks(url: str):
        from kryptone_ray.corpus.synth import row_index_of

        i = row_index_of(url)
        if i is None or not (0 <= i < spec.n_rows) or spec.url_of(i) != url:
            return []
        return spec.outlinks(i)

    cs = CrawlSpec(batch_size=BATCH, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=MAX_PAGES)
    corpus = bench.ensure_corpus(N_ROWS)
    return RayCrawler(corpus_dir=corpus, outlinks_fn=outlinks, spec=cs,
                      run_dir=run_dir, num_seen_shards=8, mode="tasks")


def child(cmd: str, run_dir: str) -> None:
    import threading

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import bench

    from kryptone_ray.corpus.synth import seed_urls

    eng = _engine(run_dir)
    if cmd == "phase1":
        # SIGKILL the whole process ~40% into the crawl — a watcher
        # thread polls the metrics log the engine appends per window
        def killer():
            target = MAX_PAGES * 2 // 5
            manifest = pathlib.Path(run_dir, "checkpoint", "manifest.json")
            while True:
                time.sleep(0.25)
                done = sum(1 for _ in pathlib.Path(run_dir, "metrics")
                           .glob("batch-*.parquet")) * BATCH
                # kill only once a COMPLETE checkpoint exists (a kill
                # inside the very first checkpoint write is the
                # nothing-to-resume case, covered by unit tests)
                if done >= target and manifest.exists():
                    os._exit(137)  # hard kill, no cleanup — the crash

        threading.Thread(target=killer, daemon=True).start()
        eng.run(seeds=seed_urls(bench.bench_spec(N_ROWS), SEEDS),
                checkpoint_every=1)
        print(json.dumps({"phase1": "finished-without-kill"}))
    elif cmd == "phase2":
        eng.resume(seed_urls(bench.bench_spec(N_ROWS), SEEDS))
        t0 = time.time()
        eng.run(seeds=None, checkpoint_every=1)
        m = eng.metrics()
        print(json.dumps({"resume_sec": round(time.time() - t0, 2),
                          "pages_visited": m["pages_visited"],
                          "seen_size": m["seen_size"]}))
    else:  # reference uninterrupted run
        t0 = time.time()
        eng.run(seeds=seed_urls(bench.bench_spec(N_ROWS), SEEDS))
        m = eng.metrics()
        print(json.dumps({"ref_sec": round(time.time() - t0, 2),
                          "pages_visited": m["pages_visited"],
                          "seen_size": m["seen_size"]}))
    ray.shutdown()


def main() -> None:
    import shutil
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="kr_resume_smoke_"))
    run_a = base / "interrupted"
    run_b = base / "reference"
    env = dict(os.environ)
    py = sys.executable
    me = os.path.abspath(__file__)

    t0 = time.time()
    r1 = subprocess.run([py, me, "--child", "phase1", str(run_a),
                         str(N_ROWS), str(MAX_PAGES)], env=env,
                        capture_output=True, text=True)
    killed = r1.returncode == 137
    ck_batches = len(list((run_a / "metrics").glob("batch-*.parquet")))

    r2 = subprocess.run([py, me, "--child", "phase2", str(run_a),
                         str(N_ROWS), str(MAX_PAGES)], env=env,
                        capture_output=True, text=True, check=True)
    resume = json.loads(r2.stdout.strip().splitlines()[-1])

    r3 = subprocess.run([py, me, "--child", "ref", str(run_b),
                         str(N_ROWS), str(MAX_PAGES)], env=env,
                        capture_output=True, text=True, check=True)
    ref = json.loads(r3.stdout.strip().splitlines()[-1])

    # equality of end state + no batch fetched twice
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pyarrow as pa

    def visits(run_dir):
        files = sorted(pathlib.Path(run_dir, "visits").glob("batch-*.parquet"))
        t = pa.concat_tables([pq.read_table(f, columns=["visit_idx", "url"])
                              for f in files])
        return t.take(pc.sort_indices(t["visit_idx"]))

    va, vb = visits(run_a), visits(run_b)
    same_visits = (va["url"].to_pylist() == vb["url"].to_pylist()
                   and va["visit_idx"].to_pylist() == vb["visit_idx"].to_pylist())
    # tasks mode writes several slice files per window (same bidx,
    # unique tag); "no re-fetch" therefore means: no page visited twice
    # — every visit_idx appears exactly once and the sequence is gapless
    idxs = va["visit_idx"].to_pylist()
    no_refetch = idxs == list(range(len(idxs)))

    print(json.dumps({
        "n_rows": N_ROWS, "max_pages": MAX_PAGES,
        "killed_mid_run": killed,
        "batches_before_kill": ck_batches,
        "resume": resume, "reference": ref,
        "visits_identical_to_uninterrupted": bool(same_visits),
        "no_batch_fetched_twice": bool(no_refetch),
        "seen_size_match": resume["seen_size"] == ref["seen_size"],
        "total_sec": round(time.time() - t0, 1),
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()
