"""Stash-alternated paired A/B — THE round-11 measurement standard for
every per-query claim (VERDICT r10 item 9). Alternates WORK (current
working tree) and HEAD (git stash) runs of tools/time_registry_noop.py
over the named queries, one fresh Spark process per run, several
rounds, and stamps the per-round PAIRS (never cross-session absolutes)
into docs/. Timings in this sandbox are bimodal, so only the per-round
deltas and their sign pattern are meaningful.

Usage:
    python tools/ab_stash_paired.py out_name q1,q2[,...] [--rounds 4] \
        [--sf /root/testdata/sf0.1] [--repeat 2]
Writes docs/AB_<out_name>.json.
"""
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_measure(names, sf, repeat):
    out = tempfile.mktemp(suffix=".json")
    subprocess.run(
        [sys.executable, "tools/time_registry_noop.py", sf,
         "--json", out, "--repeat", str(repeat), "--only", ",".join(names)],
        cwd=REPO, check=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    rows = json.load(open(out))["results"]
    os.unlink(out)
    return {r["query"]: {"sec": r["sec"], "build": r.get("build_sec")}
            for r in rows}


def main():
    out_name = sys.argv[1]
    names = sys.argv[2].split(",")
    rounds = 4
    sf = "/root/testdata/sf0.1"
    repeat = 2
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    dirty = subprocess.run(["git", "diff", "--quiet"], cwd=REPO).returncode
    if not dirty:
        print("working tree is clean — nothing to A/B against HEAD",
              file=sys.stderr)
        sys.exit(1)

    pairs = []
    for rnd in range(rounds):
        work = run_measure(names, sf, repeat)
        subprocess.run(["git", "stash", "--quiet"], cwd=REPO, check=True)
        try:
            head = run_measure(names, sf, repeat)
        finally:
            subprocess.run(["git", "stash", "pop", "--quiet"], cwd=REPO,
                           check=True)
        pair = {q: {"work": work[q]["sec"], "head": head[q]["sec"],
                    "work_build": work[q]["build"],
                    "head_build": head[q]["build"]} for q in names}
        pairs.append(pair)
        for q in names:
            print(f"round {rnd} {q}: work={work[q]['sec']:.2f}s "
                  f"head={head[q]['sec']:.2f}s", flush=True)

    summary = {}
    for q in names:
        w = [p[q]["work"] for p in pairs]
        h = [p[q]["head"] for p in pairs]
        deltas = [round(wi - hi, 3) for wi, hi in zip(w, h)]
        summary[q] = {"work_median": round(statistics.median(w), 3),
                      "head_median": round(statistics.median(h), 3),
                      "deltas": deltas,
                      "improved_rounds": sum(d < 0 for d in deltas)}
        print(f"{q}: work median {summary[q]['work_median']}s, "
              f"head median {summary[q]['head_median']}s, deltas {deltas}")
    doc = {"_comment": ("Stash-alternated paired A/B; only per-round "
                        "work-head deltas are meaningful (bimodal box). "
                        "NOT comparable across sessions."),
           "sf": sf, "rounds": rounds, "repeat": repeat,
           "queries": names, "pairs": pairs, "summary": summary}
    path = os.path.join(REPO, "docs", f"AB_{out_name}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
