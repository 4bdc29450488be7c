"""Connected-components dedup grouping vs a pure-python reference."""

import pandas as pd


def _python_cc(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    # canonical = min element of each set
    out = {}
    for x in list(parent):
        root = find(x)
        out[x] = min(out.get(x, x), root)
    # resolve to true minimum via another pass
    changed = True
    while changed:
        changed = False
        for x in out:
            r = out[out[x]] if out[x] in out else out[x]
            if r < out[x]:
                out[x] = r
                changed = True
    return out


def test_connected_components_matches_python(spark):
    from open_parse_spark.operators.dedup import connected_components, dedup_keep_list

    pairs = [
        (1, 2), (2, 3),          # chain -> component 1
        (10, 11),                # pair -> component 10
        (20, 21), (21, 22), (20, 22),  # triangle -> 20
        (30, 40), (40, 50), (50, 60), (60, 70),  # long chain -> 30
    ]
    pdf = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    pairs_df = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs_df).collect()
    }
    want = _python_cc(pairs)
    assert got == want

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": sorted(want) + [99]})
    )
    keep = {r["doc_id"]: r["keep"] for r in dedup_keep_list(docs, pairs_df).collect()}
    assert keep[99] is True           # not in any component
    assert keep[1] is True and keep[2] is False and keep[3] is False
    assert keep[20] is True and keep[22] is False
    assert keep[30] is True and keep[70] is False
