"""Framework-free wall probe: P independent processes each run the build's
dominant per-file kernel (corpus-row gen + parse + tokenize, pure
numpy/regex, zero shared state, zero Ray).  If embarrassingly-parallel
processes stop scaling 4->16, the VM's memory bandwidth binds — any
framework would measure the same."""
import json, multiprocessing as mp, sys, time

sys.path.insert(0, "/root/repo")


def worker(args):
    start, n = args
    from distributedcodesearchengine_ray.sources.corpus import gen_corpus_row
    from distributedcodesearchengine_ray.stages.parse import parse_content, entity_document
    from distributedcodesearchengine_ray.functions.tokenizer import tokenize

    t0 = time.time()
    docs = 0
    for i in range(start, start + n):
        r = gen_corpus_row(i, 42, 4)
        for e in parse_content(r["content"], r["path"], r["repo"], r["lang"]):
            tokenize(entity_document(e))
            docs += 1
    return time.time() - t0, docs


def run(p, files_per_proc):
    with mp.Pool(p) as pool:
        t0 = time.time()
        res = pool.map(worker, [(k * files_per_proc, files_per_proc) for k in range(p)])
        wall = time.time() - t0
    total_files = p * files_per_proc
    return {"procs": p, "wall_sec": round(wall, 2),
            "files_per_sec": round(total_files / wall, 1)}


if __name__ == "__main__":
    fpp = 12000
    runs = [run(4, fpp), run(16, fpp), run(4, fpp), run(16, fpp)]
    best4 = max((r for r in runs if r["procs"] == 4), key=lambda r: r["files_per_sec"])
    best16 = max((r for r in runs if r["procs"] == 16), key=lambda r: r["files_per_sec"])
    eff = best16["files_per_sec"] / best4["files_per_sec"] / 4.0
    print(json.dumps({"kernel": "gen+parse+tokenize, zero-share multiprocessing",
                      "p4": best4, "p16": best16,
                      "eff_4_to_16": round(eff, 3), "runs": runs}))
