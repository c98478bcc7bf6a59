"""Capture .explain('formatted') for named queries into plans/r06/<name>_<tag>.txt."""
import contextlib, io, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as E
    from alibi_detect_spark.session import get_spark
    spark = get_spark("plan-capture", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = E.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for n in names:
        df = qs[n](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = f"plans/r06/{n}_{tag}.txt"
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out), "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        print(n, "Exchange:", txt.count("Exchange"), "BroadcastHashJoin:", txt.count("BroadcastHashJoin"),
              "SortMergeJoin:", txt.count("SortMergeJoin"), "ArrowEval/BatchEval:", txt.count("EvalPython"),
              "lines:", len(txt.splitlines()))

if __name__ == "__main__":
    main()
