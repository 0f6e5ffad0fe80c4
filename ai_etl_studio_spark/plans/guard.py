"""Read-only plan guard.

The reference achieved read-only execution only via database GRANTs on the
remote server (.config/README.md:55-66). Here Spark *is* the engine, and
``spark.sql("DROP TABLE t")`` executes eagerly — so the statement must be
vetted BEFORE it reaches ``spark.sql``. Two layers:

1. textual gate (sqlgen/sanitize.is_read_only) — cheap, catches the common
   case;
2. this module — parse the statement with Spark's own SQL parser (no
   analysis, no execution) and reject any plan whose class is a Command
   (DDL/DML nodes all extend Command in Catalyst).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def parsed_plan_class(spark: SparkSession, sql: str) -> str:
    """Parse (without executing) and return the logical plan class name."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    plan = parser.parsePlan(sql)
    return plan.getClass().getName()


#: statement wrappers that are writes but do NOT extend the Command trait
#: (verified by parsing: InsertIntoStatement has Command=False)
_COMMAND_MARKERS = ("Command", "InsertInto", "Delete", "Update", "Merge", "Write")

_COMMAND_TRAIT = "org.apache.spark.sql.catalyst.plans.logical.Command"


def is_read_only_plan(spark: SparkSession, sql: str) -> bool:
    """True iff the parsed plan is a pure query.

    Checks the Catalyst ``Command`` trait (covers CTAS/DDL/DML v2 nodes
    whose class names don't contain 'Command') plus name markers for the
    statement wrappers that don't extend it (InsertIntoStatement).
    Falls back to True on JVM-access failure — the textual gate has
    already run by the time this is called.
    """
    try:
        parser = spark._jsparkSession.sessionState().sqlParser()
        plan = parser.parsePlan(sql)
    except Exception as exc:  # ParseException bubbles to the caller
        if "ParseException" in type(exc).__name__:
            raise
        return True
    try:
        trait = spark.sparkContext._jvm.java.lang.Class.forName(_COMMAND_TRAIT)
        if trait.isInstance(plan):
            return False
    except Exception:
        pass
    cls = plan.getClass().getName()
    return not any(marker in cls for marker in _COMMAND_MARKERS)


def explain_str(df, mode: str = "formatted") -> str:
    """Return (not print) the physical-plan explain output."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )
