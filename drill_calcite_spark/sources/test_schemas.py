"""The reference's standard correctness-corpus schemas as Spark fixtures.

The reference runs its quidem end-to-end scripts
(core/src/test/resources/sql/*.iq) against small in-memory catalogs
registered by CalciteAssert (core/src/test/java/org/apache/calcite/test/
CalciteAssert.java:812-882 — the POST schema's EMP/DEPT/DEPT30/EMPS/
TICKER view tables) and the hsqldb "Scott" catalog (EMP 14 rows / DEPT 4
rows / SALGRADE 5 rows; row values pinned by the scripts' own expected
dumps, e.g. some.iq:24-45, join.iq:266-280, lateral.iq:105-112). Those
scripts compare query text against INLINE EXPECTED RESULTS — the
reference's conformance data. Registering byte-identical fixtures here
lets tests/test_quidem.py replay the same queries and hold this engine
to the reference's own published answers.

Data values below are transcriptions of that public test data, nothing
more; all query execution is ordinary Spark SQL over temp views.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import SparkSession

_D = datetime.date


def _dec(v: str | None) -> Decimal | None:
    return None if v is None else Decimal(v)


# POST.EMP — CalciteAssert.java:816-829 (9 rows, nullable deptno)
_POST_EMP = [
    ("Jane", 10, "F"), ("Bob", 10, "M"), ("Eric", 20, "M"),
    ("Susan", 30, "F"), ("Alice", 30, "F"), ("Adam", 50, "M"),
    ("Eve", 50, "F"), ("Grace", 60, "F"), ("Wilma", None, "F"),
]

# POST.DEPT — CalciteAssert.java:830-838
_POST_DEPT = [(10, "Sales"), (20, "Marketing"), (30, "Engineering"),
              (40, "Empty")]

# POST.EMPS — CalciteAssert.java:844-853 (5 rows; duplicate empno 110)
_POST_EMPS = [
    (100, "Fred", 10, None, None, 40, 25, True, False, _D(1996, 8, 3)),
    (110, "Eric", 20, "M", "San Francisco", 3, 80, None, False,
     _D(2001, 1, 1)),
    (110, "John", 40, "M", "Vancouver", 2, None, False, True,
     _D(2002, 5, 3)),
    (120, "Wilma", 20, "F", None, 1, 5, None, True, _D(2005, 9, 7)),
    (130, "Alice", 40, "F", "Vancouver", 2, None, False, True,
     _D(2007, 1, 1)),
]

# POST.TICKER — CalciteAssert.java:854-879 (20 trading days)
_TICKER = [("ACME", _D(2017, 12, d), p) for d, p in zip(
    range(1, 21),
    [12, 17, 19, 21, 25, 12, 15, 20, 24, 25,
     19, 15, 25, 25, 14, 12, 14, 24, 23, 22])]

# Scott EMP — values from the scripts' own dump (some.iq:24-45)
_SCOTT_EMP = [
    (7369, "SMITH", "CLERK", 7902, _D(1980, 12, 17), "800.00", None, 20),
    (7499, "ALLEN", "SALESMAN", 7698, _D(1981, 2, 20), "1600.00", "300.00",
     30),
    (7521, "WARD", "SALESMAN", 7698, _D(1981, 2, 22), "1250.00", "500.00",
     30),
    (7566, "JONES", "MANAGER", 7839, _D(1981, 2, 4), "2975.00", None, 20),
    (7654, "MARTIN", "SALESMAN", 7698, _D(1981, 9, 28), "1250.00",
     "1400.00", 30),
    (7698, "BLAKE", "MANAGER", 7839, _D(1981, 1, 5), "2850.00", None, 30),
    (7782, "CLARK", "MANAGER", 7839, _D(1981, 6, 9), "2450.00", None, 10),
    (7788, "SCOTT", "ANALYST", 7566, _D(1987, 4, 19), "3000.00", None, 20),
    (7839, "KING", "PRESIDENT", None, _D(1981, 11, 17), "5000.00", None,
     10),
    (7844, "TURNER", "SALESMAN", 7698, _D(1981, 9, 8), "1500.00", "0.00",
     30),
    (7876, "ADAMS", "CLERK", 7788, _D(1987, 5, 23), "1100.00", None, 20),
    (7900, "JAMES", "CLERK", 7698, _D(1981, 12, 3), "950.00", None, 30),
    (7902, "FORD", "ANALYST", 7566, _D(1981, 12, 3), "3000.00", None, 20),
    (7934, "MILLER", "CLERK", 7782, _D(1982, 1, 23), "1300.00", None, 10),
]

# Scott DEPT — join.iq:266-280 / lateral.iq:105-112
_SCOTT_DEPT = [(10, "ACCOUNTING", "NEW YORK"), (20, "RESEARCH", "DALLAS"),
               (30, "SALES", "CHICAGO"), (40, "OPERATIONS", "BOSTON")]

# Scott SALGRADE — canonical hsqldb scott grades
_SCOTT_SALGRADE = [(1, 700, 1200), (2, 1201, 1400), (3, 1401, 2000),
                   (4, 2001, 3000), (5, 3001, 9999)]


def register_post(spark: SparkSession) -> None:
    """Register the POST schema as temp views (CalciteAssert POST spec)."""
    spark.createDataFrame(
        _POST_EMP, "ename string, deptno int, gender string"
    ).createOrReplaceTempView("emp")
    spark.createDataFrame(
        _POST_DEPT, "deptno int, dname string"
    ).createOrReplaceTempView("dept")
    spark.sql("select * from dept where deptno = 30") \
        .createOrReplaceTempView("dept30")
    spark.createDataFrame(
        _POST_EMPS,
        "empno int, name string, deptno int, gender string, city string, "
        "empid int, age int, slacker boolean, manager boolean, "
        "joinedat date",
    ).createOrReplaceTempView("emps")
    spark.createDataFrame(
        _TICKER, "symbol string, tstamp date, price int"
    ).createOrReplaceTempView("ticker")


def register_scott(spark: SparkSession) -> None:
    """Register the Scott catalog as scott_-prefixed temp views (the
    quidem runner rewrites '"scott".' to 'scott_')."""
    rows = [(e[0], e[1], e[2], e[3], e[4], _dec(e[5]), _dec(e[6]), e[7])
            for e in _SCOTT_EMP]
    spark.createDataFrame(
        rows,
        "empno int, ename string, job string, mgr int, hiredate date, "
        "sal decimal(7,2), comm decimal(7,2), deptno int",
    ).createOrReplaceTempView("scott_emp")
    spark.createDataFrame(
        _SCOTT_DEPT, "deptno int, dname string, loc string"
    ).createOrReplaceTempView("scott_dept")
    spark.createDataFrame(
        _SCOTT_SALGRADE, "grade int, losal int, hisal int"
    ).createOrReplaceTempView("scott_salgrade")


# HR schema — JdbcTest.java:7147-7180 (FIXTURES.md §2): nullable
# commission, array-of-struct employees, nullable struct location.
_HR_EMPS = [
    (100, 10, "Bill", 10000.0, 1000),
    (200, 20, "Eric", 8000.0, 500),
    (150, 10, "Sebastian", 7000.0, None),
    (110, 10, "Theodore", 11500.0, 250),
]
_HR_DEPTS = [
    (10, "Sales", [(100, 10, "Bill", 10000.0, 1000),
                   (150, 10, "Sebastian", 7000.0, None)], (-122, 38)),
    (30, "Marketing", [], (0, 52)),
    (40, "HR", [(200, 20, "Eric", 8000.0, 500)], None),
]
_HR_DEPENDENTS = [(10, "Michael"), (10, "Jane")]
_HR_LOCATIONS = [(10, "San Francisco"), (20, "San Diego")]

_HR_EMP_TYPE = ("empid int, deptno int, name string, salary double, "
                "commission int")


def register_hr(spark: SparkSession) -> None:
    """Register the HR schema as hr_-prefixed temp views."""
    spark.createDataFrame(_HR_EMPS, _HR_EMP_TYPE) \
        .createOrReplaceTempView("hr_emps")
    spark.createDataFrame(
        _HR_DEPTS,
        f"deptno int, name string, employees array<struct<{_HR_EMP_TYPE}>>,"
        " location struct<x int, y int>",
    ).createOrReplaceTempView("hr_depts")
    spark.createDataFrame(
        _HR_DEPENDENTS, "empid int, name string"
    ).createOrReplaceTempView("hr_dependents")
    spark.createDataFrame(
        _HR_LOCATIONS, "empid int, name string"
    ).createOrReplaceTempView("hr_locations")


# CATCHALL reflective schema — ReflectiveSchemaTest.java:946-994; the
# quidem conditions.iq cases use its "nullables"/"bools" tables.
_NULLABLES = [(1, "A"), (2, "B"), (2, "C"), (3, None)]
_BOOLS = [(1, "T"), (2, "F"), (3, None)]


def register_catchall(spark: SparkSession) -> None:
    spark.createDataFrame(_NULLABLES, "id int, value string") \
        .createOrReplaceTempView("nullables")
    spark.createDataFrame(_BOOLS, "id int, value string") \
        .createOrReplaceTempView("bools")
