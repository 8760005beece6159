"""Disk I/O wall probe: P zero-share processes each read distinct corpus
parquet shards (pyarrow, all columns) and write them back out to /tmp —
the byte flow of the build's extract phase with zero compute, zero Ray."""
import glob, json, multiprocessing as mp, os, shutil, sys, time


def worker(args):
    wid, files = args
    import pyarrow as pa
    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)
    import pyarrow.parquet as pq
    out = f"/tmp/diskbench/{wid}"
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    nbytes = 0
    for i, f in enumerate(files):
        t = pq.read_table(f)
        nbytes += t.nbytes
        pq.write_table(t, f"{out}/{i}.parquet")
    return time.time() - t0, nbytes


def run(p, shards_per_proc):
    files = sorted(glob.glob("/tmp/rcs_bench/corpus-2000000-r4/*.parquet"))
    shutil.rmtree("/tmp/diskbench", ignore_errors=True)
    tasks = [(k, files[k * shards_per_proc:(k + 1) * shards_per_proc]) for k in range(p)]
    with mp.Pool(p) as pool:
        t0 = time.time()
        res = pool.map(worker, tasks)
        wall = time.time() - t0
    gb = sum(r[1] for r in res) / 1e9
    return {"procs": p, "wall_sec": round(wall, 2), "GBps": round(gb / wall, 2)}


if __name__ == "__main__":
    runs = [run(4, 4), run(16, 1), run(4, 4), run(16, 1)]
    b4 = max((r for r in runs if r["procs"] == 4), key=lambda r: r["GBps"])
    b16 = max((r for r in runs if r["procs"] == 16), key=lambda r: r["GBps"])
    print(json.dumps({"p4": b4, "p16": b16,
                      "eff_4_to_16": round(b16["GBps"] / b4["GBps"] / 4.0, 3),
                      "runs": runs}))
