"""One-off scanner: walk every queries() logical plan and report
partitionless Window nodes over non-provably-bounded input.
(The durable gate lives in tests/test_plans.py; this script is for
iterating quickly.)"""
import sys

sys.path.insert(0, "/root/repo")

BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}


def _bounded(node) -> bool:
    name = node.nodeName()
    if name == "GlobalLimit" or name in BOUNDED_LEAVES:
        return True
    if name == "Aggregate" and node.groupingExpressions().size() == 0:
        return True
    n = node.children().size()
    if n == 0:
        return False
    return all(_bounded(node.children().apply(i)) for i in range(n))


def unbounded_partitionless_windows(df):
    bad = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().size() == 0:
            if not _bounded(node):
                bad.append(node.toString().splitlines()[0][:200])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


if __name__ == "__main__":
    from otd_semantic_framework_spark.session import get_spark
    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scan-windows", master="local[8]")
    fails = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            bad = unbounded_partitionless_windows(df)
            if bad:
                fails[name] = bad
                print(f"BAD   {name}: {bad}")
            else:
                print(f"ok    {name}")
        except Exception as exc:  # noqa: BLE001
            fails[name] = [f"ERROR {exc}"]
            print(f"ERR   {name}: {exc}")
    print()
    print("violations:", len(fails))
    for k, v in fails.items():
        print(" -", k, v[0][:120])
