"""Gate on the committed ANN retrieval-quality artifact
(docs/RECALL_sf1.json, produced by tools/recall_sf1.py on the sf1
embeddings): the approximate similarity paths must hold their stated
recall floors, recall must be monotone in probe width, and the
full-probe IVF must be EXACT — the properties a user of SURVEY §2.11's
SIMILARITY_SEARCH relies on. Exactness-degradation is additionally
tested live on small fixtures in test_extensions.py; this file pins the
at-scale numbers so a regression in the operators (or a stale artifact
after retuning) fails CI rather than silently shipping worse retrieval.
"""

import json
import os

ART = os.path.join(os.path.dirname(__file__), os.pardir,
                   "docs", "RECALL_sf1.json")


def _load():
    assert os.path.exists(ART), \
        "docs/RECALL_sf1.json missing — run tools/recall_sf1.py"
    with open(ART) as f:
        return json.load(f)


def test_recall_artifact_shape():
    d = _load()
    assert d["k"] == 10 and d["n_queries"] >= 50 and d["n_corpus"] >= 10000
    assert {e["bands"] for e in d["lsh"]} >= {4, 8, 16}
    assert {e["nprobe"] for e in d["ivf_trained"]} >= {1, 4, 16}


def test_lsh_recall_floor():
    d = _load()
    lsh = {e["bands"]: e["recall_at_k"] for e in d["lsh"]}
    # measured 0.93 / 0.94 at sf1; floor set with margin for re-tuning,
    # tight enough to catch a hashing/banding regression
    assert lsh[8] >= 0.85 and lsh[16] >= 0.85
    assert lsh[16] >= lsh[4]       # more bands never hurts recall


def test_ivf_recall_floor_monotone_and_exact_at_full_probe():
    d = _load()
    ivf = sorted(d["ivf_trained"], key=lambda e: e["nprobe"])
    rec = [e["recall_at_k"] for e in ivf]
    assert rec == sorted(rec), "recall must be monotone in nprobe"
    by_probe = {e["nprobe"]: e["recall_at_k"] for e in ivf}
    # measured 0.95 / 0.98 at sf1
    assert by_probe[1] >= 0.90 and by_probe[4] >= 0.95
    # nprobe = n_centroids probes every cell -> identical to brute force
    full = [e for e in ivf if e["nprobe"] == e["n_centroids"]]
    assert full and full[0]["recall_at_k"] == 1.0
