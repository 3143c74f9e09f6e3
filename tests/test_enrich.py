"""IP→CIDR enrichment: parsing, containment, longest-prefix, plan."""

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.enrich import (
    cidr_bounds,
    ip_cidr_enrich,
    ipv4_to_long,
)


def _blocks(spark):
    rows = [
        ("10.0.0.0/8", "corp"),
        ("10.5.0.0/16", "net5"),
        ("10.5.7.0/24", "lab"),
        ("10.5.7.128/25", "lab-b"),
        ("192.168.13.37/32", "host"),
        ("172.16.0.3/12", "rfc1918-b"),  # unaligned base → 172.16.0.0
    ]
    return spark.createDataFrame(rows, ["cidr", "label"])


def _ips(spark):
    rows = [
        (1, "10.5.7.200"),   # corp, net5, lab, lab-b → lab-b
        (2, "10.5.7.9"),     # corp, net5, lab → lab
        (3, "10.5.9.1"),     # corp, net5 → net5
        (4, "10.200.0.1"),   # corp only
        (5, "192.168.13.37"),  # exact /32
        (6, "192.168.13.38"),  # no match
        (7, "172.31.255.255"),  # last address of the /12
        (8, "172.32.0.0"),   # first address past it: no match
    ]
    return spark.createDataFrame(rows, ["ip_id", "ip"])


def test_parse_helpers(spark):
    df = spark.range(1).select(
        ipv4_to_long(F.lit("1.2.3.4")).alias("n"),
        *[
            c.alias(n)
            for c, n in zip(
                cidr_bounds(F.lit("10.5.7.9/24")), ["start", "size", "prefix"]
            )
        ],
    )
    r = df.collect()[0]
    assert r.n == 16909060
    assert r.size == 256 and r.prefix == 24
    assert r.start == 10 * 16777216 + 5 * 65536 + 7 * 256


def _brute(ips, blocks, longest):
    def ipn(s):
        a, b, c, d = map(int, s.split("."))
        return a * 16777216 + b * 65536 + c * 256 + d

    out = []
    for ip_id, ip in ips:
        matches = []
        for cidr, label in blocks:
            base, p = cidr.split("/")
            p = int(p)
            size = 2 ** (32 - p)
            start = ipn(base) // size * size
            if start <= ipn(ip) < start + size:
                matches.append((p, cidr, label))
        if longest and matches:
            matches = [max(matches)]
        out.extend((ip_id, ip, c, l) for _, c, l in matches)
    return set(out)


def test_longest_prefix_match(spark):
    got = {
        (r.ip_id, r.ip, r.cidr, r.label)
        for r in ip_cidr_enrich(_ips(spark), _blocks(spark)).collect()
    }
    exp = _brute(
        [(r.ip_id, r.ip) for r in _ips(spark).collect()],
        [(r.cidr, r.label) for r in _blocks(spark).collect()],
        longest=True,
    )
    assert got == exp
    by_id = {r[0]: r[3] for r in got}
    assert by_id == {
        1: "lab-b", 2: "lab", 3: "net5", 4: "corp",
        5: "host", 7: "rfc1918-b",
    }


def test_all_matches_mode_and_granularity(spark):
    for g in (8, 16, 24, 32):
        got = {
            (r.ip_id, r.label)
            for r in ip_cidr_enrich(
                _ips(spark), _blocks(spark), granularity=g,
                longest_prefix=False,
            ).collect()
        }
        exp = {
            (i, l)
            for i, _, _, l in _brute(
                [(r.ip_id, r.ip) for r in _ips(spark).collect()],
                [(r.cidr, r.label) for r in _blocks(spark).collect()],
                longest=False,
            )
        }
        assert got == exp, g


def test_duplicate_ip_rows_both_kept(spark):
    ips = spark.createDataFrame(
        [(1, "10.5.7.9"), (1, "10.5.7.9")], ["ip_id", "ip"]
    )
    got = ip_cidr_enrich(ips, _blocks(spark)).collect()
    assert len(got) == 2 and all(r.label == "lab" for r in got)


def test_plan_no_cartesian(spark):
    plan = (
        ip_cidr_enrich(_ips(spark), _blocks(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
