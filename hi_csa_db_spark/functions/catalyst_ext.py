"""Custom Catalyst optimizer rule via SparkSessionExtensions —
compiled Java, no Scala toolchain (SURVEY.md §4's "optional polish"
item, now real).

The shipped rule folds case-conversion idempotence the stock
optimizer does not simplify: ``upper(upper(x)) -> upper(x)`` and
``lower(lower(x)) -> lower(x)``. Small on purpose — the point is the
MECHANISM: a `Rule<LogicalPlan>` subclass (Java extending the Scala
abstract class, pattern matching via ``AbstractPartialFunction``
inside ``transformAllExpressions``) injected with
``injectOptimizerRule`` from an extension class that implements
``Function1<SparkSessionExtensions, BoxedUnit>``. Exactly this shape
scales to real rules: pushdown for a custom source, rewrite of an
engine-specific operator, cost hints.

CONSTRAINT (why this is NOT wired into the default session):
``spark.sql.extensions`` is read ONCE at SparkSession construction
and the class must be on the DRIVER classpath at JVM start — a
runtime ``ADD JAR`` is too late, and an already-running vanilla
session (the driver's) cannot gain an extension retroactively. Use
``extension_session_confs()`` when building a session that should
carry the rule; `tests/test_catalyst_ext.py` proves the fold in a
subprocess-isolated session (one JVM per process — a same-process
second builder would silently return the existing extension-less
session).

The jar is pre-built and committed (hi_csa_db_spark/jars/
upperfold-ext.jar); with a JDK present it rebuilds reproducibly from
the embedded source against the installed pyspark's jars.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

JAR_PATH = os.path.join(os.path.dirname(__file__), "..", "jars", "upperfold-ext.jar")

EXTENSION_CLASS = "upperfold.UpperFoldExtension"

JAVA_SOURCE = """
package upperfold;

import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Lower;
import org.apache.spark.sql.catalyst.expressions.Upper;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractFunction1;
import scala.runtime.AbstractPartialFunction;

// Catalyst extension: fold upper(upper(x)) -> upper(x) and
// lower(lower(x)) -> lower(x) -- case-conversion idempotence the
// stock optimizer does not simplify. Registered via
// spark.sql.extensions=upperfold.UpperFoldExtension.
public class UpperFoldExtension
    extends AbstractFunction1<SparkSessionExtensions, scala.runtime.BoxedUnit> {

  public static class UpperFoldRule extends Rule<LogicalPlan> {
    @Override
    public LogicalPlan apply(LogicalPlan plan) {
      return plan.transformAllExpressions(
          new AbstractPartialFunction<Expression, Expression>() {
            @Override
            public boolean isDefinedAt(Expression e) {
              return (e instanceof Upper && ((Upper) e).child() instanceof Upper)
                  || (e instanceof Lower && ((Lower) e).child() instanceof Lower);
            }

            @Override
            public Expression apply(Expression e) {
              if (e instanceof Upper && ((Upper) e).child() instanceof Upper) {
                return (Upper) ((Upper) e).child();
              }
              if (e instanceof Lower && ((Lower) e).child() instanceof Lower) {
                return (Lower) ((Lower) e).child();
              }
              return e;
            }
          });
    }
  }

  @Override
  public scala.runtime.BoxedUnit apply(SparkSessionExtensions ext) {
    ext.injectOptimizerRule(
        new AbstractFunction1<org.apache.spark.sql.SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(org.apache.spark.sql.SparkSession s) {
            return new UpperFoldRule();
          }
        });
    return scala.runtime.BoxedUnit.UNIT;
  }
}
"""


def build_jar(jar_path: str = JAR_PATH) -> str:
    """Compile the embedded extension source into ``jar_path``
    (requires a JDK + the installed pyspark's jars on the classpath).
    Normally unnecessary — the jar is committed."""
    import pyspark

    spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    with tempfile.TemporaryDirectory() as tmp:
        pkg = os.path.join(tmp, "upperfold")
        os.makedirs(pkg)
        src = os.path.join(pkg, "UpperFoldExtension.java")
        with open(src, "w") as f:
            f.write(JAVA_SOURCE)
        classes = os.path.join(tmp, "classes")
        os.makedirs(classes)
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-cp", spark_jars, "-d", classes, src],
            check=True,
        )
        os.makedirs(os.path.dirname(jar_path), exist_ok=True)
        subprocess.run(
            ["jar", "cf", os.path.abspath(jar_path), "-C", classes, "."],
            check=True,
        )
    return jar_path


def extension_session_confs(jar_path: str = JAR_PATH) -> dict[str, str]:
    """The builder confs a NEW SparkSession needs to carry the rule.
    Rebuilds the jar from source when missing and a JDK exists."""
    jar = os.path.abspath(jar_path)
    if not os.path.exists(jar):
        if shutil.which("javac") is None:
            raise FileNotFoundError(
                f"{jar} missing and no JDK available to rebuild it"
            )
        build_jar(jar)
    return {
        "spark.jars": jar,
        "spark.driver.extraClassPath": jar,
        "spark.sql.extensions": EXTENSION_CLASS,
    }
