"""Variable substitution (variables.py — VariableSubstitution.java:30
+ SetProcessor.java:115 parity): every Engine/CLI/tcli statement gets
the ``${...}`` pre-parse pass, fed by SET and the CLI's
``--hivevar``/``-d``/``--hiveconf`` flags."""

import pytest

from amplab_hive_spark.engine import Engine
from amplab_hive_spark.variables import VariableRegistry


# -- the substitute loop (unit) ---------------------------------------


def test_substitute_all_prefixes_and_bare(spark, monkeypatch):
    reg = VariableRegistry()
    reg.hivevars["name"] = "world"
    reg.sysprops["prop"] = "sysval"
    monkeypatch.setenv("AHS_TEST_ENV", "envval")
    out = reg.substitute(
        spark,
        "SELECT '${hivevar:name}', '${name}', '${system:prop}', "
        "'${env:AHS_TEST_ENV}'",
    )
    assert out == "SELECT 'world', 'world', 'sysval', 'envval'"


def test_hiveconf_prefix_reads_session_conf(spark):
    spark.conf.set("ahs.test.conf", "confval")
    try:
        reg = VariableRegistry()
        assert reg.substitute(spark, "x ${hiveconf:ahs.test.conf} y") \
            == "x confval y"
    finally:
        spark.conf.unset("ahs.test.conf")


def test_bare_name_is_hivevar_only_not_conf(spark):
    """Reference pin (VariableSubstitution.java:41): a prefixless
    ``${x}`` resolves against the hivevar map ONLY — it does NOT fall
    back to conf in this Hive version."""
    spark.conf.set("ahs.bare.test", "confval")
    try:
        reg = VariableRegistry()
        assert reg.substitute(spark, "${ahs.bare.test}") == "${ahs.bare.test}"
    finally:
        spark.conf.unset("ahs.bare.test")


def test_undefined_variable_passes_through(spark):
    reg = VariableRegistry()
    text = "SELECT '${hivevar:nope}' AS c, '${also_nope}' AS d"
    assert reg.substitute(spark, text) == text


def test_nested_substitution_resolves(spark):
    reg = VariableRegistry()
    reg.hivevars["inner"] = "lineitem"
    reg.hivevars["outer"] = "${hivevar:inner}"
    assert reg.substitute(spark, "SELECT * FROM ${outer}") \
        == "SELECT * FROM lineitem"


def test_depth_bound_raises(spark):
    """SystemVariables.java:152: a self-expanding variable must hit
    the 40-iteration bound, not loop forever."""
    reg = VariableRegistry()
    reg.hivevars["loop"] = "${hivevar:loop}x"
    with pytest.raises(ValueError, match="depth is deeper than 40"):
        reg.substitute(spark, "SELECT '${hivevar:loop}'")


def test_pattern_excludes_space_and_dollar(spark):
    """varPat (SystemVariables.java:30) never matches across a space
    or a '$' — '${a b}' and '${a$b}' are literal text."""
    reg = VariableRegistry()
    reg.hivevars["a b"] = "X"
    text = "SELECT '${a b}', '${a$b}'"
    assert reg.substitute(spark, text) == text


def test_substitution_disabled_via_conf(spark):
    reg = VariableRegistry()
    reg.hivevars["x"] = "HIT"
    spark.conf.set("hive.variable.substitute", "false")
    try:
        assert reg.substitute(spark, "${x}") == "${x}"
    finally:
        spark.conf.unset("hive.variable.substitute")
    assert reg.substitute(spark, "${x}") == "HIT"


# -- SET forms through Engine.sql -------------------------------------


def test_engine_set_hivevar_and_select(spark):
    eng = Engine(spark)
    eng.sql("SET hivevar:tbl=range(3)")
    rows = eng.sql("SELECT COUNT(*) AS c FROM ${tbl}").collect()
    assert rows[0].c == 3
    # prefixed spelling resolves the same map
    rows = eng.sql("SELECT COUNT(*) AS c FROM ${hivevar:tbl}").collect()
    assert rows[0].c == 3


def test_engine_set_value_is_itself_substituted(spark):
    """SetProcessor.java:133 substitutes the VALUE before storing."""
    eng = Engine(spark)
    eng.sql("SET hivevar:a=12")
    eng.sql("SET hivevar:b=${hivevar:a}34")
    assert eng.variables.hivevars["b"] == "1234"


def test_engine_set_system_and_query_form(spark):
    eng = Engine(spark)
    eng.sql("SET system:my.prop=v1")
    assert eng.variables.sysprops["my.prop"] == "v1"
    row = eng.sql("SET system:my.prop").collect()[0]
    assert (row.key, row.value) == ("system:my.prop", "v1")
    row = eng.sql("SET hivevar:missing").collect()[0]
    assert row.value == "<undefined>"


def test_engine_set_hiveconf_strips_prefix(spark):
    eng = Engine(spark)
    try:
        eng.sql("SET hiveconf:ahs.set.test=zz")
        assert spark.conf.get("ahs.set.test") == "zz"
        assert eng.sql("SELECT '${hiveconf:ahs.set.test}' AS c") \
            .collect()[0].c == "zz"
    finally:
        spark.conf.unset("ahs.set.test")


def test_engine_set_env_is_an_error(spark):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="env:.* can not be set"):
        eng.sql("SET env:PATH=/tmp")


def test_engine_bare_set_still_native(spark):
    """Bare SET stays Spark's conf SET — same key=value result shape,
    no behavior change for existing users."""
    eng = Engine(spark)
    try:
        eng.sql("SET ahs.bare.set=7")
        assert spark.conf.get("ahs.bare.set") == "7"
        row = eng.sql("SET ahs.bare.set").collect()[0]
        assert (row.key, row.value) == ("ahs.bare.set", "7")
    finally:
        spark.conf.unset("ahs.bare.set")


def test_engine_isolation_per_engine(spark):
    """Two Engines on the same session: hivevars are per-Engine
    session state (SessionState.java hiveVariables analogue)."""
    a, b = Engine(spark), Engine(spark)
    a.sql("SET hivevar:mine=alpha")
    assert b.sql("SELECT '${mine}' AS c").collect()[0].c == "${mine}"
    assert a.sql("SELECT '${mine}' AS c").collect()[0].c == "alpha"


# -- CLI flags ---------------------------------------------------------


def test_cli_hivevar_define_flags(spark, sf_dir, capsys):
    from amplab_hive_spark.cli import main

    assert main([
        "-e", "SELECT '${greeting} ${hivevar:who}' AS msg",
        "--hivevar", "greeting=hello", "-d", "who=world",
        "--sf-dir", sf_dir,
    ]) == 0
    assert "hello world" in capsys.readouterr().out


def test_cli_f_script_and_i_init(spark, sf_dir, tmp_path, capsys):
    from amplab_hive_spark.cli import main

    init = tmp_path / "init.sql"
    init.write_text("SET hivevar:lim=2;\n")
    script = tmp_path / "q.sql"
    script.write_text(
        "SELECT n_name FROM nation ORDER BY n_name LIMIT ${lim};\n")
    assert main(["-f", str(script), "-i", str(init),
                 "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert out.count("NATION_") == 2


def test_cli_hiveconf_flag_and_disable_negative(spark, sf_dir, capsys):
    """The negative gate: --hiveconf hive.variable.substitute=false
    turns the pass off — the ${} text reaches Catalyst verbatim."""
    from amplab_hive_spark.cli import main

    try:
        assert main([
            "-e", "SELECT '${hivevar:x}' AS c",
            "--hivevar", "x=SUBSTITUTED",
            "--hiveconf", "hive.variable.substitute=false",
            "--sf-dir", sf_dir,
        ]) == 0
        out = capsys.readouterr().out
        assert "${hivevar:x}" in out and "SUBSTITUTED" not in out
    finally:
        spark.conf.unset("hive.variable.substitute")


def test_cli_malformed_flag_fails_fast(spark):
    from amplab_hive_spark.cli import main

    with pytest.raises(SystemExit):
        main(["-e", "SELECT 1", "--hivevar", "novalue"])


def test_cli_serve_rejects_client_session_flags(spark):
    from amplab_hive_spark.cli import main

    with pytest.raises(SystemExit):
        main(["--serve", "--hivevar", "a=b"])


# -- tcli (JDBC) path --------------------------------------------------


def test_tcli_set_hivevar_per_connection(spark):
    """Over the wire: SET hivevar + ${} substitution work per JDBC
    connection, and a second connection does NOT see the first's
    variables (per-session SessionState, like HS2)."""
    from tests.test_tcli_front import _Client, _op_fields
    from amplab_hive_spark.tcli import T_I32, T_I64, T_STRUCT, TCLIFront

    front = TCLIFront(spark)
    front.start()
    c1, c2 = _Client(front.port), _Client(front.port)
    try:
        s1, s2 = c1.open_session(), c2.open_session()
        r = c1.execute(s1, "SET hivevar:who=alpha")
        assert r[1][1] == 0
        r = c1.execute(s1, "SELECT '${who}' AS g")
        assert r[1][1] == 0
        fr = c1.call("FetchResults", [
            (1, T_STRUCT, _op_fields(r[2])), (2, T_I32, 0), (3, T_I64, 10),
        ])
        assert fr[3][3][0][7][1] == [b"alpha"]
        # isolation: session 2 sees the undefined passthrough
        r = c2.execute(s2, "SELECT '${who}' AS g")
        assert r[1][1] == 0
        fr = c2.call("FetchResults", [
            (1, T_STRUCT, _op_fields(r[2])), (2, T_I32, 0), (3, T_I64, 10),
        ])
        assert fr[3][3][0][7][1] == [b"${who}"]
    finally:
        c1.close()
        c2.close()
        front.stop()


# -- review r13 pins ----------------------------------------------------


def test_set_interception_survives_leading_comments(spark):
    """review r13 (parse-tree-over-regex class): Spark's native SET
    strips leading comments, so the interception must too — otherwise
    '/* banner */ SET hivevar:k=v' silently becomes a CONF named
    'hivevar:k' and ${k} never resolves."""
    eng = Engine(spark)
    eng.sql("/* tool banner */ SET hivevar:cmt=yes")
    assert eng.variables.hivevars["cmt"] == "yes"
    eng.sql("-- line comment\nSET hivevar:cmt2=also")
    assert eng.variables.hivevars["cmt2"] == "also"
    eng.sql("/* a */ -- b\n /* c */ SET hivevar:cmt3=chained")
    assert eng.variables.hivevars["cmt3"] == "chained"
    with pytest.raises(ValueError, match="env:.* can not be set"):
        eng.sql("/* hidden */ SET env:HOME=/tmp")


def test_set_prefix_matching_is_case_sensitive(spark):
    """review r13: the reference's SetProcessor startsWith checks are
    case-sensitive, so 'SET HIVEVAR:x=1' is the BARE branch — a conf
    literally named 'HIVEVAR:x' — and the hivevar map is untouched
    (previously the lowered match stored a hivevar that the
    case-sensitive resolution could never read back)."""
    eng = Engine(spark)
    try:
        eng.sql("SET HIVEVAR:cased=1")
        assert "cased" not in eng.variables.hivevars
        assert spark.conf.get("HIVEVAR:cased") == "1"
        # and the reference-faithful non-resolution: ${HIVEVAR:cased}
        # matches no prefix and no hivevar -> passthrough
        assert eng.sql("SELECT '${HIVEVAR:cased}' AS c").collect()[0].c \
            == "${HIVEVAR:cased}"
    finally:
        spark.conf.unset("HIVEVAR:cased")


def test_cli_connect_rejects_local_engine_flags():
    # no spark fixture: pure argparse validation, errors before any
    # Spark object is touched (review r13 pass 2)
    from amplab_hive_spark.cli import main

    for flags in (["--hivevar", "a=b"], ["--hiveconf", "a=b"],
                  ["-i", "/dev/null"]):
        with pytest.raises(SystemExit):
            main(["--connect", "127.0.0.1:1", *flags, "-e", "SELECT 1"])


def test_set_interception_handles_nested_block_comments(spark):
    """review r13 pass 2: Spark's lexer nests bracketed comments
    (SPARK-28880), so the stripper must too — a non-greedy regex left
    ' */ SET ...' behind and the bypass survived."""
    eng = Engine(spark)
    eng.sql("/* outer /* inner */ still outer */ SET hivevar:nest=deep")
    assert eng.variables.hivevars["nest"] == "deep"


def test_bare_set_dump_includes_hivevars(spark):
    """SetProcessor.dumpOptions prints hivevar:/system: entries into
    the same listing as conf — the bare SET dump must carry them."""
    eng = Engine(spark)
    eng.sql("SET hivevar:dumped=v1")
    eng.sql("SET system:sysd=v2")
    rows = {r.key: r.value for r in eng.sql("SET").collect()}
    assert rows.get("hivevar:dumped") == "v1"
    assert rows.get("system:sysd") == "v2"
    # SET -v (3-column form) unions cleanly too
    rows = {r[0]: r[1] for r in eng.sql("SET -v").collect()}
    assert rows.get("hivevar:dumped") == "v1"


def test_cli_source_command(spark, sf_dir, tmp_path, capsys):
    """CliDriver's 'source <file>' command: the file's statements run
    inline on the same session, the path itself is substituted, and
    a self-sourcing file errors at the depth cap instead of spinning."""
    from amplab_hive_spark.cli import main

    inner = tmp_path / "inner.sql"
    inner.write_text("SELECT 'from_inner' AS tag;\n")
    outer = tmp_path / "outer.sql"
    outer.write_text(
        "SET hivevar:dir=%s;\nsource ${dir}/inner.sql;\n" % tmp_path)
    assert main(["-f", str(outer), "--sf-dir", sf_dir]) == 0
    assert "from_inner" in capsys.readouterr().out
    loop = tmp_path / "loop.sql"
    loop.write_text(f"source {loop};\n")
    # the nesting cap follows the print-once + abort policy now
    # (review r13 pass 9: it escaped as a raw traceback before)
    rc = main(["-f", str(loop), "--sf-dir", sf_dir])
    assert rc == 1
    assert "nesting deeper" in capsys.readouterr().err


def test_set_dump_whitespace_and_case_edges(spark):
    """review r13 pass 4: 'SET   -v' (any whitespace) is the dump
    form and carries hivevars; 'SET -V' (uppercase) is NOT the dump
    form — Spark 4 rejects it with INVALID_SET_SYNTAX, and the
    interception must fall through to that error rather than
    swallow it into a dump."""
    eng = Engine(spark)
    eng.sql("SET hivevar:edge=1")
    rows = {r[0]: r[1] for r in eng.sql("SET \t -v").collect()}
    assert rows.get("hivevar:edge") == "1"
    with pytest.raises(Exception, match="INVALID_SET_SYNTAX"):
        eng.sql("SET -V")


def test_cli_source_with_comment_and_tab(spark, sf_dir, tmp_path, capsys):
    """review r13 pass 4: a /* */ comment before 'source' (which
    split_statements preserves) or a tab after the keyword must not
    bypass the interception into Spark's parser."""
    from amplab_hive_spark.cli import main

    inner = tmp_path / "in2.sql"
    inner.write_text("SELECT 'sourced_edge' AS tag;\n")
    outer = tmp_path / "out2.sql"
    outer.write_text(f"/* init */ source\t{inner};\n")
    assert main(["-f", str(outer), "--sf-dir", sf_dir]) == 0
    assert "sourced_edge" in capsys.readouterr().out


def test_prefixed_hiveconf_set_hits_the_restricted_guard(spark):
    """review r13 pass 6 (the round's most severe finding): the
    pre-parse 'SET hiveconf:k=v' path returns from Engine.sql before
    the SetCommand tree guard runs, so it must invoke the
    restricted-conf gate itself — without it, a non-admin session
    under enforcement could 'SET hiveconf:spark.sql.authz.enabled=
    false' and silently turn the gate off (the exact ADVICE-r10 hole
    the tree guard closed for the bare spelling)."""
    import os as _os

    from amplab_hive_spark import authorization as az

    eng = Engine(spark)
    spark.conf.set("spark.sql.authz.enabled", "true")
    spark.conf.set("user.name", "var_mallory")
    try:
        for stmt in (
            "SET hiveconf:spark.sql.authz.enabled=false",
            "SET hiveconf:user.name=admin",
        ):
            with pytest.raises(PermissionError, match="restricted"):
                eng.sql(stmt)
        assert spark.conf.get("spark.sql.authz.enabled") == "true"
        # unrestricted keys still set fine under enforcement
        eng.sql("SET hiveconf:ahs.benign.key=1")
        assert spark.conf.get("ahs.benign.key") == "1"
    finally:
        spark.conf.unset("spark.sql.authz.enabled")
        spark.conf.unset("user.name")
        spark.conf.unset("ahs.benign.key")
        p = az._store_path(spark)
        if _os.path.exists(p):
            _os.remove(p)
