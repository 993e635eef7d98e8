"""CREATE TEMPORARY MACRO — pre-parse expansion shim
(functions/macros.py; reference ql/parse/MacroSemanticAnalyzer.java,
HiveParser.g:220)."""

import math

import pytest

from amplab_hive_spark.engine import Engine
from amplab_hive_spark.functions.macros import MacroError, MacroRegistry


def test_macro_registry_expansion_pure():
    r = MacroRegistry()
    assert r.handle_statement("CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + EXP(-x))")
    out = r.expand("SELECT sigmoid(l_discount) FROM lineitem")
    assert out == "SELECT (1.0 / (1.0 + EXP(-(l_discount)))) FROM lineitem"


def test_macro_args_are_call_by_name_with_parens():
    r = MacroRegistry()
    r.define("sq", ["x"], "x * x")
    # without paren-wrapping this would expand to a + 1 * a + 1
    assert r.expand("SELECT sq(a + 1)") == "SELECT ((a + 1) * (a + 1))"


def test_macro_hygiene_arg_contains_param_name():
    r = MacroRegistry()
    r.define("twice", ["x"], "x + x")
    # the column literally named x must not be re-substituted
    assert r.expand("SELECT twice(x)") == "SELECT ((x) + (x))"


def test_macro_nested_calls_and_other_macros():
    r = MacroRegistry()
    r.define("sq", ["x"], "x * x")
    r.define("quad", ["y"], "sq(sq(y))")
    assert r.expand("SELECT quad(2)") == "SELECT ((((((2)) * ((2)))) * ((((2)) * ((2))))))"


def test_macro_skips_strings_and_qualified_names():
    r = MacroRegistry()
    r.define("f", ["x"], "x + 1")
    assert r.expand("SELECT 'f(1)' AS s") == "SELECT 'f(1)' AS s"
    assert r.expand("SELECT t.f(1)") == "SELECT t.f(1)"  # qualified → not a macro


def test_macro_zero_arg_and_drop():
    r = MacroRegistry()
    r.handle_statement("CREATE TEMPORARY MACRO pi2() 6.283185307179586")
    assert r.expand("SELECT pi2()") == "SELECT (6.283185307179586)"
    assert r.handle_statement("DROP TEMPORARY MACRO pi2")
    assert r.expand("SELECT pi2()") == "SELECT pi2()"


def test_macro_arity_mismatch_raises():
    r = MacroRegistry()
    r.define("f", ["x", "y"], "x + y")
    with pytest.raises(MacroError):
        r.expand("SELECT f(1)")


def test_macro_recursion_rejected():
    r = MacroRegistry()
    r.define("loop", ["x"], "loop(x)")
    with pytest.raises(MacroError):
        r.expand("SELECT loop(1)")


def test_macro_end_to_end_engine(spark, sf_dir):
    e = Engine(spark, sf_dir=sf_dir)
    e.sql("CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + EXP(-x))")
    row = e.sql(
        "SELECT sigmoid(l_discount) AS s FROM lineitem WHERE l_discount = 0.05 LIMIT 1"
    ).collect()[0]
    assert row.s == pytest.approx(1.0 / (1.0 + math.exp(-0.05)))
    # macros are session objects on the Engine, not global state
    e2 = Engine(spark, sf_dir=sf_dir)
    assert e2.macros.expand("SELECT sigmoid(1)") == "SELECT sigmoid(1)"


def test_macro_parameterized_type_in_signature():
    """Hive-legal parameterized types in the signature must not cut
    the param list at the inner ')': m(x DECIMAL(10,2), y DECIMAL(6,2))."""
    r = MacroRegistry()
    assert r.handle_statement(
        "CREATE TEMPORARY MACRO net(p DECIMAL(10,2), d DECIMAL(6,2)) p * (1 - d)"
    )
    assert r.expand("SELECT net(a, b)") == "SELECT ((a) * (1 - (b)))"


def test_macro_empty_body_rejected():
    r = MacroRegistry()
    with pytest.raises(MacroError):
        r.handle_statement("CREATE TEMPORARY MACRO nothing(x INT)")


def test_macro_empty_param_decl_rejected():
    """A dangling comma in the signature is MacroError, not a raw
    IndexError escaping the module's declared error contract."""
    r = MacroRegistry()
    with pytest.raises(MacroError, match="empty parameter"):
        r.handle_statement("CREATE TEMPORARY MACRO m(, x INT) x + 1")


def test_macro_body_string_literals_untouched():
    """Regression: a parameter name appearing inside one of the
    BODY's own string literals is content, not an identifier — Hive
    inlines at the AST level and never rewrites literals. Previously
    concat('x=', x) expanded the x inside 'x=' too."""
    r = MacroRegistry()
    assert r.handle_statement("CREATE TEMPORARY MACRO tagit(x STRING) concat('x=', x)")
    assert r.expand("SELECT tagit(c_name)") == "SELECT (concat('x=', (c_name)))"


def test_macro_param_case_insensitive():
    """HiveQL identifiers are case-insensitive: body spells X, the
    declaration spells x — must still substitute."""
    r = MacroRegistry()
    assert r.handle_statement("CREATE TEMPORARY MACRO inc(x INT) X + 1")
    assert r.expand("SELECT inc(5)") == "SELECT ((5) + 1)"


def test_macro_expansion_survives_block_comment_and_escaped_quote():
    """The expansion lexer must treat /* */ comments and
    backslash-escaped quotes as opaque — previously the apostrophe in
    a comment opened a 'string' that swallowed the macro call."""
    r = MacroRegistry()
    r.define("m", ("a",), "a * 2")
    assert (
        r.expand("SELECT /* isn't this nice */ m(3)")
        == "SELECT /* isn't this nice */ ((3) * 2)"
    )
    assert r.expand(r"SELECT 'don\'t call m(1)', m(2)") == (
        r"SELECT 'don\'t call m(1)', ((2) * 2)"
    )
    assert r.expand("SELECT `m`(1)") == "SELECT `m`(1)"  # backticked ident is not a call
