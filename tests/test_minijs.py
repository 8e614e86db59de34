"""JS-subset interpreter for ruleset plugins (minijs.py): language
semantics, builtins, the reference's result-export contract, op budget,
and integration with the plugin registry + scrape stage."""

import pytest

from thecrowler_ray.minijs import MiniJsError, run_script


def test_literals_arith_strings():
    assert run_script("1 + 2 * 3") == 7
    assert run_script("(1 + 2) * 3") == 9
    assert run_script("'a' + 1 + 2") == "a12"
    assert run_script("1 + 2 + 'a'") == "3a"
    assert run_script("10 % 3") == 1
    assert run_script("7 / 2") == 3.5
    assert run_script("-5 + +3") == -2
    assert run_script("'abc'.length") == 3
    assert run_script("[1,2,3].length") == 3
    assert run_script("true ? 'y' : 'n'") == "y"
    assert run_script("null") is None


def test_variables_and_control_flow():
    assert run_script("var x = 2; x += 3; x") == 5
    assert run_script("let s = 0; for (var i = 1; i <= 10; i++) s += i; s") == 55
    assert run_script("""
        var n = 10, a = 0, b = 1;
        while (n > 0) { var t = a + b; a = b; b = t; n--; }
        a
    """) == 55
    assert run_script("var x = 5; if (x > 3) { x = 'big' } else { x = 'small' } x") == "big"


def test_functions_and_closures():
    assert run_script("""
        function add(a, b) { return a + b; }
        add(2, 3)
    """) == 5
    assert run_script("""
        var mk = function(k) { return function(x) { return x * k; }; };
        var triple = mk(3);
        triple(7)
    """) == 21
    assert run_script("[1,2,3].map(function(x) { return x * x; })") == [1, 4, 9]
    assert run_script(
        "[1,2,3,4].filter(function(x) { return x % 2 === 0; })") == [2, 4]


def test_objects_arrays_json():
    assert run_script("var o = {a: 1, b: 'x'}; o.a + o.b") == "1x"
    assert run_script("var o = {}; o.k = 'v'; o['j'] = 2; JSON.stringify(o)") \
        == '{"k":"v","j":2}'
    assert run_script("JSON.parse('{\"n\": 3}').n * 2") == 6
    assert run_script("Object.keys({x: 1, y: 2})") == ["x", "y"]
    assert run_script("Array.isArray([1])") is True
    assert run_script("var a = []; a.push(1); a.push(2, 3); a.join('-')") == "1-2-3"


def test_string_methods():
    assert run_script("' Hello World '.trim().toLowerCase()") == "hello world"
    assert run_script("'a,b,c'.split(',')") == ["a", "b", "c"]
    assert run_script("'crawler'.indexOf('w')") == 3
    assert run_script("'crawler'.slice(0, 5)") == "crawl"
    assert run_script("'crawler'.includes('raw')") is True
    assert run_script("'aXbXc'.replace('X', '-')") == "a-bXc"  # first only
    assert run_script("parseInt('42px')") == 42
    assert run_script("parseFloat('3.5rem')") == 3.5
    assert run_script("Math.floor(3.9) + Math.max(1, 5, 2)") == 8


def test_params_and_result_export_contract():
    # reference contract: params bound; `var result = ...` wins over the
    # final expression (plugins.go:2265-2299)
    out = run_script("var result = params.url.toUpperCase(); 'ignored'",
                     {"url": "http://a.test/"})
    assert out == "HTTP://A.TEST/"
    # without result: last expression value
    assert run_script("params.n * 2", {"n": 21}) == 42


def test_op_budget_and_isolation():
    with pytest.raises(MiniJsError, match="op budget"):
        run_script("while (true) { 1; }", max_ops=10_000)
    # no host access: unknown identifiers raise, nothing leaks in
    with pytest.raises(MiniJsError):
        run_script("require('fs')")
    with pytest.raises(MiniJsError):
        run_script("open('/etc/passwd')")


def test_registry_js_plugin_and_scrape_selector():
    from thecrowler_ray.plugins import PluginRegistry

    reg = PluginRegistry()
    reg.register_js_plugin("title_words", """
        var words = params.html.split(' ').filter(
            function(w) { return w.length > 3; });
        var result = words.slice(0, 2);
    """)
    got = reg.run_plugin("title_words",
                         {"html": "the quick brown fox jumps", "url": "u"})
    assert got == ["quick", "brown"]
    # bad scripts fail at registration, not scrape time
    with pytest.raises(MiniJsError):
        reg.register_js_plugin("broken", "var = ;")


def test_real_world_shape_script():
    """A typical scraping post-processor: normalize a price string."""
    src = """
        function clean(p) {
            var s = p.trim().replace('$', '');
            var i = 0, out = '';
            for (i = 0; i < s.length; i++) {
                var c = s.charAt(i);
                if (c !== ',') out += c;
            }
            return parseFloat(out);
        }
        var result = {price: clean(params.raw), currency: 'USD'};
    """
    assert run_script(src, {"raw": " $1,234.50 "}) == {
        "price": 1234.5, "currency": "USD"
    }


REF_PLUGINS = "/root/reference/pkg/infoseed/testdata/candidate_plugins"
REF_LIB = "/root/reference/plugins/lib"


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_PLUGINS), reason="reference absent"
)
def test_reference_candidate_processor_plugin_runs_verbatim():
    """Characterization: the reference's own deterministic candidate
    processor fixture (an engine_plugin JS file) runs UNMODIFIED through
    minijs and reproduces its documented decisions per host."""
    src = open(f"{REF_PLUGINS}/deterministic_candidate_processor.js").read()

    out = run_script(src, {"candidate": {"host": "Reject.Example.Test",
                                         "score": 0.7}})
    assert out["accepted"] is False
    assert out["score"] == 0.01
    assert out["reason"] == "rejected by deterministic fixture"

    out = run_script(src, {"candidate": {"host": "accepted.example.test"}})
    assert out["accepted"] is True and out["score"] == 0.91
    assert out["tags"] == ["deterministic-fixture"]
    assert out["metadata"]["input_host"] == "accepted.example.test"
    assert "source_overrides" not in out

    out = run_script(src, {"candidate": {"host": "override.example.test"}})
    assert out["score"] == 0.97
    assert out["source_overrides"]["priority"] == "critical"
    assert out["source_overrides"]["source_config"]["crawling_config"][
        "source_type"] == "website"

    out = run_script(src, {"candidate": {"Host": "other.test", "Score": 0.5}})
    assert out["accepted"] is True and out["score"] == 0.5


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_LIB), reason="reference absent"
)
def test_reference_math_utils_lib_plugin_runs_verbatim():
    """The reference's math_utils lib_plugin (IIFE + typeof/isNaN +
    throw new Error) runs unmodified; its exported API works."""
    src = open(f"{REF_LIB}/math_utils.js").read()
    probe = src + """
        var result = [math_utils.add(2, 3),
                      math_utils.subtract(10, 4),
                      math_utils.clamp(99, 0, 10),
                      math_utils.clamp(-5, 0, 10)];
    """
    assert run_script(probe) == [5, 6, 10, 0]
    # its guard clauses throw like the original
    with pytest.raises(MiniJsError, match="must be numbers"):
        run_script(src + "\nvar result = math_utils.add('a', 1);")


# A tiny JS shim reproducing the reference's Node test harness surface
# (plugins/lib/*.test.js call test/assert* helpers); the suites under it
# are the reference's own files, UNMODIFIED.
_TEST_HARNESS = """
var __passed = 0; var __failed = [];
function test(name, fn) {
    try { fn(); __passed = __passed + 1; }
    catch (e) { __failed.push(name + ': ' + e.message); }
}
function assertDeepEqual(a, b) {
    if (JSON.stringify(a) !== JSON.stringify(b)) {
        throw new Error('expected ' + JSON.stringify(b) +
                        ' got ' + JSON.stringify(a));
    }
}
function assertEqual(a, b) {
    if (a !== b) { throw new Error('expected ' + JSON.stringify(b) +
                                   ' got ' + JSON.stringify(a)); }
}
function assertTrue(v) { if (!v) { throw new Error('expected truthy'); } }
function assertFalse(v) { if (v) { throw new Error('expected falsy'); } }
function assertThrows(fn) {
    var threw = false;
    try { fn(); } catch (e) { threw = true; }
    if (!threw) { throw new Error('did not throw'); }
}
"""


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_LIB), reason="reference absent"
)
def test_reference_json_query_full_test_suite_green():
    """The reference's json_query lib_plugin AND its entire test file
    (plugins/lib/json_query.test.js — 26 cases: $ root selectors, [*]
    wildcards, recursive descent, bracket-quoted keys, queryJSON parsing,
    first/exists/count missing-value semantics) run verbatim and all pass."""
    src = open(f"{REF_LIB}/json_query.js").read()
    tests = open(f"{REF_LIB}/json_query.test.js").read()
    out = run_script(
        src + _TEST_HARNESS + "var result = json_query;\n" + tests +
        "\nvar result = {passed: __passed, failed: __failed};",
        {}, max_ops=5_000_000)
    assert out["failed"] == []
    assert out["passed"] == 26


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_LIB), reason="reference absent"
)
def test_reference_math_utils_full_test_suite_green():
    """The reference's math_utils.test.js (7 cases incl. assertThrows on
    type guards) runs verbatim and all pass."""
    src = open(f"{REF_LIB}/math_utils.js").read()
    tests = open(f"{REF_LIB}/math_utils.test.js").read()
    out = run_script(
        src + _TEST_HARNESS + "var result = math_utils;\n" + tests +
        "\nvar result = {passed: __passed, failed: __failed};",
        {}, max_ops=5_000_000)
    assert out["failed"] == []
    assert out["passed"] == 7


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/plugins/api"),
    reason="reference absent",
)
def test_reference_api_ping_pong_plugin_runs_verbatim():
    """The reference's api_plugin example (plugins/api/api_ping_pong.js:
    `new Date().toISOString()` + HTTP-context echo) runs unmodified;
    the deterministic Date seam makes the timestamp reproducible."""
    src = open("/root/reference/plugins/api/api_ping_pong.js").read()
    out = run_script(
        src,
        {"event": None,
         "jsonData": {"input": "hi",
                      "http": {"method": "GET", "path": "/v1/plugin/ping",
                               "query": "x=1"}}},
        now_ms=1755400000000)
    assert out["pong"] is True
    assert out["timestamp"] == "2025-08-17T03:06:40.000Z"
    assert out["input"] == "hi"
    assert out["http"] == {"method": "GET", "path": "/v1/plugin/ping",
                           "query": "x=1"}


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/examples"),
    reason="reference absent",
)
def test_reference_tyrell_source_config_plugin_runs_verbatim():
    """examples/tyrell-information-seed-candidate-plugin.js (an
    engine_plugin building nested source_overrides) runs unmodified."""
    src = open("/root/reference/examples/"
               "tyrell-information-seed-candidate-plugin.js").read()
    out = run_script(src, {
        "candidate": {"url": "https://tyrell.example/", "host":
                      "Tyrell.Example", "score": 0.8},
        "source_defaults": {"priority": "high"}})
    assert out["accepted"] is True and out["score"] == 0.8
    so = out["source_overrides"]
    assert so["priority"] == "high" and so["restricted"] == 1
    assert so["source_config"]["crawling_config"] == {
        "site": "https://tyrell.example/", "source_type": "website"}
    assert so["source_config"]["custom"]["discovery_host"] == "tyrell.example"
    out2 = run_script(src, {"candidate": {"URL": "http://insecure.example/"}})
    assert out2["accepted"] is False
    assert out2["reason"] == "candidate is not an HTTPS URL"
    assert "source_overrides" not in out2


REF_ROOT = "/root/reference"


@pytest.mark.skipif(not __import__("os").path.exists(f"{REF_ROOT}/plugins/lib"),
                    reason="reference checkout missing")
def test_reference_plugin_unit_tests_pass_verbatim():
    """The reference's OWN JS unit-test files (plugins/lib/*.test.js) run
    through the ported test harness (plugins.go PlgTestHarness +
    ExecEnginePluginTest) on minijs — every test must pass, pinning
    lib-plugin semantics AND the new/prototype/this support the harness's
    `throw new Error(...)` paths exercise."""
    from thecrowler_ray.plugins import exec_plugin_test

    for lib_name in ("math_utils", "json_query"):
        lib = open(f"{REF_ROOT}/plugins/lib/{lib_name}.js").read()
        tst = open(f"{REF_ROOT}/plugins/lib/{lib_name}.test.js").read()
        results = exec_plugin_test(lib, tst)
        assert len(results) >= 7
        failed = [r for r in results if not r["passed"]]
        assert not failed, failed


@pytest.mark.skipif(not __import__("os").path.exists(f"{REF_ROOT}/plugins"),
                    reason="reference checkout missing")
def test_reference_plugin_load_census():
    """Every reference plugin/candidate-processor script loads: plain
    plugins run bare; test_plugin files run under the harness; the DOM
    plugin runs with a document (domjs). Count must not regress."""
    import glob

    from thecrowler_ray.domjs import run_dom_plugin
    from thecrowler_ray.minijs import run_script
    from thecrowler_ray.plugins import exec_plugin_test

    files = (sorted(glob.glob(f"{REF_ROOT}/plugins/**/*.js", recursive=True))
             + sorted(glob.glob(
                 f"{REF_ROOT}/pkg/infoseed/testdata/candidate_plugins/*.js"))
             + [f"{REF_ROOT}/examples/"
                "tyrell-information-seed-candidate-plugin.js"])
    loaded = []
    for f in files:
        src = open(f).read()
        try:
            if f.endswith(".test.js"):
                lib = open(f.replace(".test.js", ".js")).read()
                assert all(r["passed"] for r in exec_plugin_test(lib, src))
            elif "document" in src:
                run_dom_plugin(src, "<html><body><div class="
                               "'article-content'><p>x</p></div>"
                               "</body></html>")
            else:
                run_script(src)
            loaded.append(f)
        except Exception as e:  # pragma: no cover - report which file
            raise AssertionError(f"{f} failed to load: {e}") from e
    assert len(loaded) == len(files) >= 8


def test_labeled_break_continue():
    # labeled break exits the OUTER loop from inside the inner one
    assert run_script("""
        var hits = [];
        outer: for (var i = 0; i < 5; i++) {
            for (var j = 0; j < 5; j++) {
                if (i * j >= 6) break outer;
                hits.push(i + ':' + j);
            }
        }
        hits.join(',')
    """) == "0:0,0:1,0:2,0:3,0:4,1:0,1:1,1:2,1:3,1:4,2:0,2:1,2:2"
    # labeled continue skips to the next OUTER iteration
    assert run_script("""
        var s = '';
        loop: for (var i = 0; i < 4; i++) {
            for (var j = 0; j < 4; j++) {
                if (j > i) continue loop;
                s += i + '' + j + ' ';
            }
        }
        s.trim()
    """) == "00 10 11 20 21 22 30 31 32 33"
    # a labeled non-loop block: break exits the block only
    assert run_script("""
        var out = 'a';
        blk: { out += 'b'; if (true) break blk; out += 'x'; }
        out += 'c';
        out
    """) == "abc"
    # unlabeled break still binds to the nearest loop
    assert run_script("""
        var n = 0;
        outer: for (var i = 0; i < 3; i++) {
            for (var j = 0; j < 10; j++) { if (j === 2) break; n++; }
        }
        n
    """) == 6
    # labeled while + continue
    assert run_script("""
        var n = 0, i = 0;
        w: while (i < 5) { i++; if (i % 2 === 0) continue w; n += i; }
        n
    """) == 9


def test_loose_equality_es5():
    # null == undefined (both directions), but not to anything else
    assert run_script("null == undefined") is True
    assert run_script("null == 0") is False
    assert run_script("undefined == ''") is False
    # number <-> string coercion
    assert run_script("1 == '1'") is True
    assert run_script("'2.5' == 2.5") is True
    assert run_script("'' == 0") is True
    assert run_script("'abc' == 0") is False
    # boolean coercion
    assert run_script("true == 1") is True
    assert run_script("false == '0'") is True
    assert run_script("true == 'true'") is False
    # NaN never equals
    assert run_script("NaN == NaN") is False
    # objects: identity to each other, ToPrimitive vs primitives
    assert run_script("var a = {x:1}; var b = a; a == b") is True
    assert run_script("({x:1}) == ({x:1})") is False
    # strict stays strict
    assert run_script("1 === '1'") is False
    assert run_script("1 != '1'") is False
    assert run_script("1 !== '1'") is True


def test_object_literal_accessors():
    # getter computes from sibling state
    assert run_script("""
        var o = { first: 'ada', last: 'lovelace',
                  get full() { return this.first + ' ' + this.last; } };
        o.full
    """) == "ada lovelace"
    # setter routes writes; getter sees the effect
    assert run_script("""
        var o = { _v: 0,
                  get v() { return this._v; },
                  set v(x) { this._v = x * 2; } };
        o.v = 21;
        o.v
    """) == 42
    # index access and compound assignment hit the accessor pair
    assert run_script("""
        var o = { _n: 1, get n() { return this._n; },
                  set n(x) { this._n = x; } };
        o['n'] += 4;
        o.n
    """) == 5
    # getter-only: writes are silent no-ops (ES5 sloppy mode)
    assert run_script("""
        var o = { get ro() { return 7; } };
        o.ro = 99;
        o.ro
    """) == 7
    # JSON.stringify resolves getters like real property reads
    assert run_script("""
        var o = { a: 1, get b() { return this.a + 1; } };
        JSON.stringify(o)
    """) == '{"a":1,"b":2}'
    # a plain key named get/set still parses
    assert run_script("({ get: 3, set: 4 }).get + ({get: 3, set: 4}).set") == 7


def test_switch_statement():
    # dispatch with fall-through and default
    assert run_script("""
        function kind(x) {
            switch (x) {
                case 1:
                case 2: return 'small';
                case 3: return 'three';
                default: return 'big';
            }
        }
        kind(1) + ',' + kind(2) + ',' + kind(3) + ',' + kind(9)
    """) == "small,small,three,big"
    # strict matching: '1' does not hit case 1
    assert run_script("""
        var r = 'none';
        switch ('1') { case 1: r = 'num'; break; default: r = 'def'; }
        r
    """) == "def"
    # break ends fall-through; default can sit mid-list
    assert run_script("""
        var log = [];
        switch (2) {
            case 1: log.push('a');
            default: log.push('d');
            case 2: log.push('b'); break;
            case 3: log.push('c');
        }
        log.join('')
    """) == "b"
    # no match and no default: nothing runs
    assert run_script("""
        var r = 'un'; switch (7) { case 1: r = 'x'; } r
    """) == "un"


def test_for_in_and_in_operator():
    assert run_script("""
        var o = { a: 1, b: 2, c: 3 }, ks = [];
        for (var k in o) ks.push(k);
        ks.join(',')
    """) == "a,b,c"
    assert run_script("""
        var total = 0, o = { x: 10, y: 20 };
        for (var k in o) total += o[k];
        total
    """) == 30
    # array for-in yields string indices; break/continue work
    assert run_script("""
        var a = ['p', 'q', 'r'], s = '';
        for (var i in a) { if (i === '1') continue; s += i + a[i]; }
        s
    """) == "0p2r"
    # the in operator: own keys, proto fallback, arrays
    assert run_script("'a' in ({ a: 1 })") is True
    assert run_script("'z' in ({ a: 1 })") is False
    assert run_script("'hasOwnProperty' in ({})") is True
    assert run_script("1 in ['x', 'y']") is True
    assert run_script("5 in ['x', 'y']") is False
    assert run_script("'length' in []") is True


def test_void_and_comma_operator():
    assert run_script("void 0") is run_script("undefined")
    assert run_script("typeof void ('side' + 'effect')") == "undefined"
    assert run_script("var i = 0, j = 0; i = (j = 2, j + 3); i") == 5
    assert run_script("""
        var s = '';
        for (var i = 0, j = 3; i < j; i++, j--) s += i + '' + j;
        s
    """) == "0312"


def test_bind_reduceright_defineproperty():
    # Function.prototype.bind: this + partial application
    assert run_script("""
        function add(a, b) { return this.base + a + b; }
        var add10 = add.bind({ base: 10 }, 1);
        add10(2) + add10(5)
    """) == 29
    # bound functions are functions and still bindable via call sites
    assert run_script("""
        var f = function() { return this.x; }.bind({ x: 7 });
        typeof f === 'function' ? f() : -1
    """) == 7
    # reduceRight folds from the end
    assert run_script(
        "['a','b','c'].reduceRight(function(acc, x) { return acc + x; }, '>')"
    ) == ">cba"
    assert run_script(
        "[1,2,3].reduceRight(function(a, x) { return a - x; })") == 0
    # Object.defineProperty: data + accessor descriptors
    assert run_script("""
        var o = {};
        Object.defineProperty(o, 'v', { value: 5 });
        Object.defineProperty(o, 'twice', {
            get: function() { return this.v * 2; },
            set: function(x) { this.v = x / 2; }
        });
        o.twice = 8;
        o.v * 100 + o.twice
    """) == 408
    # Object.create links the prototype chain; getOwnPropertyNames is own-only
    assert run_script("""
        var proto = { greet: function() { return 'hi ' + this.name; } };
        var o = Object.create(proto);
        o.name = 'ada';
        o.greet() + '|' + Object.getOwnPropertyNames(o).join(',')
    """) == "hi ada|name"


def test_function_declaration_hoisting():
    # ES5 10.5: function declarations bind before the scope's body runs
    assert run_script("f(); function f() { return 1; } f();") == 1
    assert run_script("""
        function g() { return inner() + 1; function inner() { return 8; } }
        g();
    """) == 9
    # mutual recursion across two declarations
    assert run_script("""
        function even(n) { return n === 0 ? true : odd(n - 1); }
        function odd(n) { return n === 0 ? false : even(n - 1); }
        even(10) && !odd(10);
    """) is True
    # var hoisting: the NAME enters scope as undefined, the init does not run
    assert run_script("var r = typeof x; var x = 1; r;") == "undefined"
    # a function-expression initializer must NOT hoist
    assert run_script(
        "var t = typeof h; var h = function() {}; t;") == "undefined"


def test_typeof_undeclared_is_undefined():
    assert run_script("typeof nope;") == "undefined"
    assert run_script("typeof nope === 'undefined' ? 'safe' : 'no';") == "safe"


def test_named_function_expression():
    # the name binds only inside the function's own scope (ES5 13)
    assert run_script("""
        var f = function fact(n) { return n < 2 ? 1 : n * fact(n - 1); };
        f(5);
    """) == 120
    assert run_script(
        "var f = function g() { return 1; }; typeof g;") == "undefined"


def test_array_elisions():
    assert run_script("var a = [1,,3]; a.length;") == 3
    assert run_script("var a = [1,,3]; a[1] === undefined;") is True
    assert run_script("[1,2,].length;") == 2
    assert run_script("[,,].length;") == 2


def test_try_catch_completion_value():
    assert run_script("try { throw { code: 42 }; } catch (e) { e.code; }") == 42
    assert run_script("try { throw 'boom'; } catch (e) { e; }") == "boom"
    assert run_script("try { 'ok'; } finally { 'discarded'; }") == "ok"


def test_es5_library_surface_r5():
    # String.prototype.search / lastIndexOf
    assert run_script("'hello'.search(/l+/);") == 2
    assert run_script("'hello'.search('lo');") == 3
    assert run_script("'abcabc'.lastIndexOf('b');") == 4
    # Array.prototype.splice: remove / insert / negative start
    assert run_script(
        "var a=[1,2,3,4]; var r=a.splice(1,2);"
        "r.join('')+':'+a.join('');") == "23:14"
    assert run_script("var a=[1,4]; a.splice(1,0,2,3); a.join('');") == "1234"
    assert run_script(
        "var a=[1,2,3]; a.splice(-1).join('') + ':' + a.length;") == "3:2"
    assert run_script("[1,2,1,3].lastIndexOf(1);") == 2
    assert run_script("[1].lastIndexOf(9);") == -1
    # Object.getPrototypeOf / Number constants
    assert run_script(
        "var p={}; var o=Object.create(p);"
        "Object.getPrototypeOf(o)===p;") is True
    assert run_script("Number.MAX_VALUE > 1e308;") is True
    # URI coding (the JS unescaped sets, not Python's defaults)
    assert run_script("encodeURIComponent('a b&c/d');") == "a%20b%26c%2Fd"
    assert run_script(
        "encodeURI('http://x.test/a b?q=1&r=2');") == \
        "http://x.test/a%20b?q=1&r=2"
    assert run_script("decodeURIComponent('a%20b%26c');") == "a b&c"
    # Error constructors as first-class globals + instanceof semantics
    assert run_script(
        "try { throw new Error('x'); } catch (e) "
        "{ e instanceof Error; }") is True
    assert run_script(
        "try { throw new TypeError('x'); } catch (e) "
        "{ (e instanceof TypeError) && (e instanceof Error); }") is True
    assert run_script("Error('m').message;") == "m"
    # Number.prototype.toString(radix); Date ToNumber via valueOf
    assert run_script(
        "(255).toString(16) + ':' + (10).toString(2) + ':'"
        "+ (-255).toString(16);") == "ff:1010:-ff"
    assert run_script("+new Date(5);") == 5
    assert run_script("new Date(5) - new Date(2);") == 3


def test_es5_library_surface_r5_batch2():
    # substr (Annex B), split limit, function length
    assert run_script("'abcdef'.substr(1, 3);") == "bcd"
    assert run_script("'abcdef'.substr(-2);") == "ef"
    assert run_script("'a,b,c'.split(',', 2).join('|');") == "a|b"
    assert run_script("(function(a,b){}).length;") == 2
    # Date getters on the deterministic UTC clock (Jan 2 1970 = Friday)
    assert run_script(
        "var d=new Date(86400000);"
        "d.getUTCFullYear()+':'+d.getMonth()+':'+d.getUTCDate()"
        "+':'+d.getDay()+':'+d.getTimezoneOffset();") == "1970:0:2:5:0"
    # number formatting (JS exponent style, no zero padding)
    assert run_script("(123.456).toPrecision(4);") == "123.5"
    assert run_script("(12345).toExponential(2);") == "1.23e+4"
    # exec() results carry .index/.input and stay arrays
    assert run_script(
        "var m = /(\\w+)@(\\w+)/.exec('hi joe@corp');"
        "m[1] + m[2] + ':' + m.index + ':' + m.length;") == "joecorp:3:3"
    assert run_script("/a/.exec('bab').join('');") == "a"


def test_es5_library_surface_r5_batch3():
    # JSON.stringify replacer + space arguments (ES5 15.12.3)
    assert run_script(
        "JSON.stringify({a:1,b:[1,2]}, null, 2);") == \
        '{\n  "a": 1,\n  "b": [\n    1,\n    2\n  ]\n}'
    assert run_script("JSON.stringify({a:1,b:2}, ['a']);") == '{"a":1}'
    assert run_script(
        "JSON.stringify({a:1,b:2}, function(k,v)"
        "{ return k === 'b' ? undefined : v; });") == '{"a":1}'
    # ToString semantics: arrays join, objects tag, regex literal form
    assert run_script("'' + [1,2];") == "1,2"
    assert run_script("'' + [1,null,2];") == "1,,2"
    assert run_script("'' + {};") == "[object Object]"
    assert run_script("'' + /ab/gi;") == "/ab/gi"
    assert run_script(
        "'' + NaN + ':' + Infinity + ':' + (-Infinity);") == \
        "NaN:Infinity:-Infinity"
    assert run_script("var o={}; o[NaN]=1; o['NaN'];") == 1
    # Object.keys over arrays; primitive wrappers
    assert run_script("Object.keys([7,8]).join(',');") == "0,1"
    assert run_script(
        "'a'.localeCompare('b') + ':' + 'b'.localeCompare('a')"
        "+ ':' + 'a'.localeCompare('a');") == "-1:1:0"
    assert run_script("(5).valueOf();") == 5
    assert run_script("(true).toString();") == "true"
    assert run_script("'x'.toString() + 'y'.valueOf();") == "xy"


def test_prefix_increment_decrement():
    # prefix ++/-- return the NEW value (ES5 11.4.4-5); postfix the old
    assert run_script("var c=0; var f=function(){return ++c;}; f(); f()") == 2
    assert run_script("var i=5; --i; i") == 4
    assert run_script("var i=0; [++i, i++, i].join(',')") == "1,1,2"
    assert run_script("var o={n:1}; ++o.n; o.n") == 2


def test_with_statement():
    # ES5 12.10: object joins the scope chain for reads and writes
    assert run_script("var o={x:5}; var r; with(o){ r=x; } r") == 5
    assert run_script("var o={x:1}; with(o){ x=9; } o.x") == 9
    # names NOT on the object fall through to the outer scope; new
    # names bind outside the with wrapper (object envs never capture)
    assert run_script(
        "var o={x:1}, y=2; with(o){ y=7; z=3; } [y, o.z===undefined, z]"
        ".join(',')") == "7,true,3"
    # var inside with hoists to the function scope, not the object
    assert run_script(
        "var o={}; function f(){ with(o){ var v=4; } return v; } f()") == 4
    with pytest.raises(MiniJsError):
        run_script("with(5){}")


def test_arguments_callee():
    assert run_script(
        "(function(n){ return n<=1?1:n*arguments.callee(n-1); })(5)") == 120


def test_object_integrity_levels():
    # freeze: no writes, adds, or deletes (silently ignored, non-strict)
    assert run_script(
        "var o=Object.freeze({a:1}); o.a=2; o.b=3; delete o.a;"
        "[o.a, o.b===undefined, 'a' in o, Object.isFrozen(o)].join(',')"
    ) == "1,true,true,true"
    # seal: writes OK, adds and deletes blocked
    assert run_script(
        "var o=Object.seal({a:1}); o.a=2; o.b=3; delete o.a;"
        "[o.a, o.b===undefined, 'a' in o, Object.isSealed(o),"
        " Object.isFrozen(o)].join(',')") == "2,true,true,true,false"
    # preventExtensions: only adds blocked
    assert run_script(
        "var o=Object.preventExtensions({a:1}); o.b=2; o.a=5; delete o.a;"
        "[o.b===undefined, 'a' in o, Object.isExtensible(o)].join(',')"
    ) == "true,false,false"
    # frozen arrays: index writes and length assignment ignored
    assert run_script(
        "var a=Object.freeze([1,2]); a[0]=9; a[5]=9; a.length=0;"
        "a.join(',')+'/'+a.length") == "1,2/2"
    assert run_script("Object.isExtensible({})") is True


def test_property_is_enumerable():
    assert run_script("({a:1}).propertyIsEnumerable('a')") is True
    assert run_script("({a:1}).propertyIsEnumerable('b')") is False
    # inherited properties are not own (ES5 15.2.4.7)
    assert run_script(
        "var o=Object.create({p:1}); o.propertyIsEnumerable('p')") is False


def test_date_parse_utc_and_ctor_forms():
    assert run_script("Date.parse('1970-01-01T00:00:01Z')") == 1000
    assert run_script("Date.parse('1970-01-02')") == 86400000
    # offset timezones normalize to UTC epoch ms
    assert run_script("Date.parse('1970-01-01T01:00:00+01:00')") == 0
    assert run_script("isNaN(Date.parse('nonsense'))") is True
    assert run_script("Date.UTC(1970,0,2)") == 86400000
    assert run_script("new Date('1970-01-01T00:00:10Z').getTime()") == 10000
    assert run_script("new Date(1970,0,2).getTime()") == 86400000
    # Invalid Date: every field NaN, never a crash (ES5 15.9.1.1)
    assert run_script("isNaN(new Date('x').getTime())") is True


def test_to_primitive_user_valueof_tostring():
    # ES5 8.12.8: valueOf wins the number/default hint...
    assert run_script("({valueOf:function(){return 3;}}) * 2") == 6
    assert run_script("({valueOf:function(){return 3;}}) + 1") == 4
    assert run_script("({valueOf:function(){return 3;}}) < 4") is True
    assert run_script("+({valueOf:function(){return 7;}})") == 7
    assert run_script("({valueOf:function(){return 5;}}) == 5") is True
    # ...toString backs it up for string results
    assert run_script("({toString:function(){return 'T';}}) + '!'") == "T!"
    # Date prefers the string hint on '+' (its [[DefaultValue]] quirk)
    assert run_script("typeof (new Date(0) + 'x')") == "string"
    assert run_script("+new Date(5)") == 5
    # method-less objects still fall back to '[object Object]'
    assert run_script("({}) + ''") == "[object Object]"


def test_json_stringify_skips_functions():
    assert run_script(
        "JSON.stringify({a:undefined,b:function(){},c:1})") == '{"c":1}'
    assert run_script("JSON.stringify([1,function(){},2])") == "[1,null,2]"
    assert run_script("JSON.stringify(function(){}) === undefined") is True


def test_array_length_assignment():
    assert run_script("var a=[1,2,3]; a.length=1; a.join(',')+'/'+a.length"
                      ) == "1/1"
    assert run_script("var a=[1]; a.length=3; a.length") == 3
    assert run_script(
        "try{ [1].length=-1; 'no' }catch(e){ e.name }") == "RangeError"


def test_boolean_global():
    assert run_script("Boolean('')") is False
    assert run_script("Boolean('0')") is True
    assert run_script("Boolean()") is False


def test_index_of_from_index():
    assert run_script("[1,2,1].indexOf(1,1)") == 2
    assert run_script("[1,2,1].indexOf(1,-1)") == 2
    assert run_script("[1,2,1].lastIndexOf(1)") == 2
    assert run_script("[1,2,1].lastIndexOf(1,1)") == 0
    # strict equality: '1' does not match 1 (ES5 15.4.4.14)
    assert run_script("[1,'1',2].indexOf('1')") == 1
    assert run_script("'abcabc'.indexOf('b',2)") == 4
    assert run_script("'abcabc'.lastIndexOf('b',3)") == 1
    assert run_script("'abcabc'.lastIndexOf('b')") == 4


def test_replace_function_replacer_full_args():
    # ES5 15.5.4.11: replacer gets (match, p1..pn, offset, string)
    assert run_script(
        "'a1b2'.replace(/(\\d)/g, function(m,g1,off,s){ return g1+'@'+off; })"
    ) == "a1@1b2@3"
    assert run_script(
        "'xay'.replace('a', function(m, off, s){ return off + s; })"
    ) == "x1xayy"
    # unmatched alternation groups arrive as undefined, not ''
    assert run_script(
        "'ab'.replace(/(x)|(b)/, function(m,g1,g2){ return typeof g1; })"
    ) == "aundefined"


def test_forin_walks_prototype_chain():
    assert run_script(
        "function F(){this.a=1;} F.prototype.b=2;"
        "var ks=[]; for(var k in new F()) ks.push(k); ks.sort().join(',')"
    ) == "a,b"
    # shadowed prototype keys enumerate once (ES5 12.6.4)
    assert run_script(
        "function F(){this.b=1;} F.prototype.b=2;"
        "var n=0; for(var k in new F()) n++; n") == 1


def test_bare_var_redeclaration_keeps_value():
    # ES5 10.5/12.2: `var x;` on an existing binding is a no-op
    assert run_script("function f(x){ var x; return x; } f(7)") == 7
    assert run_script("var x=3; var x; x") == 3
    assert run_script("var y; y === undefined") is True


def test_signed_zero_division():
    assert run_script("1/-0 === -Infinity") is True
    assert run_script("-1/-0 === Infinity") is True
    assert run_script("isNaN(0/0)") is True


def test_js_number_to_string_format():
    # integral values print without a decimal up to 1e21 (ES5 9.8.1)
    assert run_script("String(9007199254740993)") == "9007199254740992"
    assert run_script("String(10000000000000000)") == "10000000000000000"
    assert run_script("String(1e21)") == "1e+21"
    # no leading zero in exponents
    assert run_script("String(1e-7)") == "1e-7"


def test_join_renders_holes_empty():
    # ES5 15.4.4.5: undefined/null elements join as ''
    assert run_script("[1,undefined,null,2].join('-')") == "1---2"


# ---------------------------------------------------------------------------
# wave 4 (round 5): node-differential probe — 24 gaps closed, each
# expectation below pinned against node's output on the same snippet
# ---------------------------------------------------------------------------


def test_array_iteration_callbacks_full_args():
    # (value, index, array) + thisArg (ES5 15.4.4.16-21)
    assert run_script(
        "var o={t:2}; [1,2,3].filter(function(x){return x>=this.t;},o)"
        ".join('')") == "23"
    assert run_script(
        "var s=''; [7,8].forEach(function(v,i,a){s+=v+':'+i+':'+a.length"
        "+';';}); s") == "7:0:2;8:1:2;"
    assert run_script(
        "[1,2].map(function(x,i,a){return x+a[1-i];}).join(',')") == "3,3"


def test_array_holes_semantics():
    # ES5 15.4: holes are skipped by iteration methods and absent for `in`
    assert run_script("[1,,3].every(function(x){return x>0;})") is True
    assert run_script("var m=[1,,3].map(function(x){return x*2;});"
                      "[m.length, 1 in m, m[0]].join(',')") == "3,false,2"
    assert run_script("[,1,,2,].reduce(function(a,b){return a+b;})") == 3
    assert run_script("new Array(3).every(function(){return false;})") is True
    assert run_script("JSON.stringify([,1,,2])") == "[null,1,null,2]"


def test_reduce_empty_no_init_typeerror():
    assert run_script(
        "var r; try { [].reduce(function(a,b){return a+b;}); r=0; }"
        "catch(e) { r = e instanceof TypeError; } r") is True


def test_array_expando_properties():
    # arrays are objects: non-index keys are real properties, visible
    # to for-in and Object.keys, invisible to JSON.stringify/length
    assert run_script(
        "var a=[9,8]; a.x=1; var s='';"
        "for(var k in a){s+=k+':'+typeof k+';';} s") == "0:string;1:string;x:string;"
    assert run_script("var a=[1]; a.x=7; [a.x, a.length, "
                      "JSON.stringify(a), Object.keys(a).join(',')]"
                      ".join('|')") == "7|1|[1]|0,x"
    assert run_script("var a=[1]; a['k']='v'; a['k']") == "v"


def test_math_round_minmax_edges():
    assert run_script("1/Math.round(-0.5) < 0") is True
    assert run_script("[Math.round(2.5), Math.round(-2.5)].join(',')") == "3,-2"
    assert run_script("String(Math.min(1,NaN))") == "NaN"
    assert run_script("Math.max() === -Infinity") is True
    assert run_script("Math.min() === Infinity") is True


def test_tofixed_exact_binary_ties():
    # (1.45).toFixed(1): binary 1.45 stores BELOW the tie -> '1.4';
    # exact ties round away from zero
    assert run_script("[(1.45).toFixed(1),(2.5).toFixed(0),"
                      "(-2.5).toFixed(0),(1.005).toFixed(2),"
                      "(123.456).toFixed(1)].join('|')") == \
        "1.4|3|-3|1.00|123.5"


def test_parseint_parsefloat_edges():
    assert run_script("parseInt('0x1f')") == 31
    assert run_script("parseInt('0X1A')") == 26
    assert run_script("parseFloat('3.5e2x')") == 350
    assert run_script("parseFloat('  .5')") == 0.5
    assert run_script("parseFloat('-Infinity') === -Infinity") is True


def test_string_hex_unicode_escapes():
    assert run_script("'\\x41\\u0042'") == "AB"
    assert run_script("'\\0'.charCodeAt(0)") == 0


def test_empty_statement():
    assert run_script("var i=0; for(;i<3;i++); i") == 3


def test_match_nonglobal_index_and_regex_flags():
    assert run_script("var m='a1b2'.match(/(\\d)/);"
                      "[m[0],m[1],m.index].join(',')") == "1,1,1"
    assert run_script("var r=/ab+/gi; [r.source,r.global,r.ignoreCase,"
                      "r.multiline].join('|')") == "ab+|true|true|false"


def test_json_parse_reviver_and_tojson():
    assert run_script(
        "JSON.stringify(JSON.parse('{\"a\":1,\"b\":{\"c\":2}}',"
        "function(k,v){return typeof v==='number'?v*10:v;}))") == \
        '{"a":10,"b":{"c":20}}'
    assert run_script(
        "JSON.stringify({toJSON:function(){return 'T';}})") == '"T"'
    assert run_script("JSON.stringify(new Date(0))") == \
        '"1970-01-01T00:00:00.000Z"'


def test_date_overflow_setters_invalid():
    # MakeDay normalization: month 12 -> January next year
    assert run_script("var d=new Date(Date.UTC(2020,12,1));"
                      "[d.getUTCFullYear(),d.getUTCMonth()].join(',')") == \
        "2021,0"
    assert run_script("String(new Date(NaN))") == "Invalid Date"
    assert run_script("var d=new Date(0); d.setUTCFullYear(1999);"
                      "d.getUTCFullYear()") == 1999
    assert run_script("var d=new Date(0); d.setUTCMonth(13);"
                      "[d.getUTCFullYear(),d.getUTCMonth()].join(',')") == \
        "1971,1"


def test_object_create_props_and_null_proto():
    assert run_script(
        "var o=Object.create({p:1},{q:{value:2,enumerable:true}});"
        "[o.p,o.q,Object.keys(o).join('')].join('|')") == "1|2|q"
    assert run_script(
        "var o=Object.create(null); o.x=1;"
        "[o.x, typeof o.toString].join(',')") == "1,undefined"


def test_defineproperty_enumerable_default_false():
    assert run_script(
        "var o={}; Object.defineProperty(o,'h',{value:1});"
        "[o.h, Object.keys(o).length, JSON.stringify(o)].join('|')") == \
        "1|0|{}"
    assert run_script(
        "var o={}; Object.defineProperty(o,'h',"
        "{value:1,enumerable:true}); Object.keys(o).join('')") == "h"


def test_integer_key_enumeration_order():
    assert run_script(
        "var o={}; o.b=1; o['2']=2; o.a=3; o['1']=4;"
        "Object.keys(o).join(',')") == "1,2,b,a"
    assert run_script(
        "JSON.stringify({b:1,'2':2,'1':3})") == '{"1":3,"2":2,"b":1}'


def test_function_prototype_and_constructor():
    assert run_script("function C(){} Object.getPrototypeOf(C)"
                      " === Function.prototype") is True
    assert run_script("Object.getPrototypeOf('x'.constructor)"
                      " === Function.prototype") is True
    assert run_script("[(5).constructor === Number,"
                      "[].constructor === Array].join(',')") == "true,true"


def test_arguments_param_aliasing():
    # non-strict ES5 10.6: arguments[i] aliases the i-th parameter
    assert run_script("function f(a){arguments[0]=9; return a;} f(1)") == 9
    assert run_script("function f(a){a=5; return arguments[0];} f(1)") == 5


def test_this_in_plain_call_is_global_object():
    assert run_script("function f(){return typeof this;} f()") == "object"
    assert run_script("var g=7; function f(){return this.g;} f()") == 7


def test_sort_undefined_last():
    assert run_script(
        "[undefined,'z','a'].sort().join(',')") == "a,z,"
    assert run_script(
        "var a=[3,undefined,1]; a.sort();"
        "[a[0],a[1],String(a[2])].join(',')") == "1,3,undefined"


# ---------------------------------------------------------------------------
# wave 5 (round 5): randomized node-differential fuzzing (28k generated
# expressions, node-verified) — coercion/Math/ToInteger edges
# ---------------------------------------------------------------------------


def test_truthiness_nan_falsy():
    # Python bool(nan) is True; JS NaN is falsy — the fuzzer's top hit
    assert run_script("NaN && 998") != 998
    assert run_script("isNaN(NaN && 998)") is True
    assert run_script("NaN || 'right'") == "right"
    assert run_script("(NaN) ? 'y' : 'n'") == "n"


def test_tonumber_arrays_and_strings():
    # ToNumber(array) goes through its join string (ES5 9.3)
    assert run_script("Number([0])") == 0
    assert run_script("[] - 1") == -1
    assert run_script("isNaN(+[1,2])") is True
    # StringNumericLiteral: hex, Infinity, strict rejects
    assert run_script("Number('0x10')") == 16
    assert run_script("Number('-Infinity') === -Infinity") is True
    assert run_script("isNaN(Number('inf'))") is True
    assert run_script("Number(' ')") == 0


def test_toprimitive_plain_object_string():
    # method-less objects ToPrimitive to '[object Object]'
    assert run_script("({}) + 1") == "[object Object]1"
    assert run_script("({}) <= 'z'") is True
    assert run_script("[] < '0'") is True  # '' < '0' string compare


def test_mod_pow_edges():
    assert run_script("isNaN(Infinity % 2)") is True
    assert run_script("5 % Infinity") == 5
    assert run_script("Math.pow(0, -1) === Infinity") is True
    assert run_script("Math.pow(-0, -1) === -Infinity") is True
    assert run_script("isNaN(Math.pow(1, Infinity))") is True
    assert run_script("isNaN(Math.pow(2, NaN))") is True
    assert run_script("Math.pow(NaN, 0)") == 1


def test_tointeger_in_method_args():
    # ToInteger: NaN -> 0 (the old int(_num()) crashed)
    assert run_script("'abc'.charAt(NaN)") == "a"
    assert run_script("'abc'.slice('x')") == "abc"
    assert run_script("'abc'.substr(undefined)") == "abc"
    assert run_script("Math.floor(NaN) !== Math.floor(NaN)") is True
    assert run_script("Math.ceil(Infinity) === Infinity") is True
    assert run_script("parseInt('')" ) != run_script("0")  # NaN, no crash
    assert run_script("isNaN(parseInt(''))") is True


def test_signed_zero_math():
    assert run_script("1/Math.min(0, -0) < 0") is True
    assert run_script("1/Math.max(-0, 0) > 0") is True
    assert run_script("1/Math.ceil(-0.3) < 0") is True
    assert run_script("1/Math.floor(-0) < 0") is True


def test_sqrt_negative_and_split_undefined():
    assert run_script("isNaN(Math.sqrt(-1))") is True
    assert run_script("'aundefinedb'.split(undefined).length") == 1
    assert run_script("'a,b'.split().join('|')") == "a,b"


def test_json_stringify_nonfinite_null():
    # fuzzer wave 6 object round: NaN/±Infinity stringify as null
    assert run_script("JSON.stringify({a: NaN, b: Infinity, c: 1/0, "
                      "d: -1/0})") == '{"a":null,"b":null,"c":null,"d":null}'
    assert run_script("JSON.stringify([NaN, 2])") == "[null,2]"


# ---------------------------------------------------------------------------
# round-5 self-review findings (each verified-by-execution before fixing)
# ---------------------------------------------------------------------------


def test_unicode_digit_keys_no_crash():
    # str.isdigit() is true for '²' but int() rejects it
    assert run_script(
        "var o={}; o['²']=1; o['1']=2; Object.keys(o).join(',')"
    ) == "1,²"
    assert run_script(
        "var o={}; o['²']=1; JSON.stringify(o)") == '{"²":1}'


def test_invalid_hex_escape_is_syntax_error():
    import pytest as _pytest

    from thecrowler_ray.minijs import MiniJsError
    with _pytest.raises(MiniJsError):
        run_script("result = '\\xzz';")
    with _pytest.raises(MiniJsError):
        run_script("result = '\\uqqqq';")
    with _pytest.raises(MiniJsError):
        run_script("result = '\\x4';")  # short escape must not eat the quote


def test_number_format_range_errors_catchable():
    assert run_script(
        "var r; try { (5).toFixed(-1); r='no'; } "
        "catch (e) { r = e instanceof RangeError; } r") is True
    assert run_script(
        "var r; try { (5).toPrecision(0); r='no'; } "
        "catch (e) { r = e instanceof RangeError; } r") is True
    assert run_script(
        "var r; try { (5).toExponential(99); r='no'; } "
        "catch (e) { r = e instanceof RangeError; } r") is True


def test_negative_index_expando_roundtrip():
    assert run_script("var a=[]; a[-1]=5; a[-1]") == 5
    assert run_script("var a=[1]; a[-1]='m'; [a.length, a[-1]].join(',')") \
        == "1,m"


def test_pop_shift_unhole():
    assert run_script("var a=[1,,]; typeof a.pop()") == "undefined"
    assert run_script("var a=[1,,]; var p=a.pop(); p === undefined") is True
    assert run_script("var a=[,1]; a.shift() === undefined") is True


def test_in_operator_sees_array_expandos():
    assert run_script("var a=[]; a.foo=1; 'foo' in a") is True
    assert run_script("var a=[1]; 'bar' in a") is False


def test_defineproperty_reexpose_enumerable():
    assert run_script(
        "var o={}; Object.defineProperty(o,'x',{value:1});"
        "Object.defineProperty(o,'x',{value:2,enumerable:true});"
        "Object.keys(o).join(',')") == "x"


def test_function_prototype_not_shared_across_scripts():
    run_script("Function.prototype.zz = 99; result = 1;")
    assert run_script(
        "function g(){} result = typeof Object.getPrototypeOf(g).zz;"
    ) == "undefined"


def test_stringify_cycle_throws_catchable_typeerror():
    assert run_script(
        "var o={}; o.self=o; var r;"
        "try { JSON.stringify(o); r='no'; }"
        "catch (e) { r = e instanceof TypeError; } r") is True
    assert run_script(
        "var r; try { JSON.stringify(this); r='no'; }"
        "catch (e) { r = e instanceof TypeError; } r") is True
    # sibling references are NOT cycles
    assert run_script(
        "var shared={v:1}; JSON.stringify({a:shared,b:shared})") == \
        '{"a":{"v":1},"b":{"v":1}}'


# ---------------------------------------------------------------------------
# wave 7 (round 5): curated probe — replace $-patterns, number ToString,
# delete-on-name, array property protocol (all node-verified)
# ---------------------------------------------------------------------------


def test_replace_dollar_patterns():
    assert run_script(
        "'abc'.replace(/(b)/, \"[$`|$'|$&|$$]\")") == "a[a|c|b|$]c"
    assert run_script(
        "'ab'.replace(/(a)(z)?/, '<$1|$2>')") == "<a|>b"
    assert run_script(
        "'abcdefghijkl'.replace("
        "/(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)/, '$11$1')") == "kal"
    assert run_script("'x'.replace('x', '$&$&')") == "xx"


def test_number_tostring_es5():
    assert run_script("(0.000001).toString()") == "0.000001"
    assert run_script("(1e-7).toString()") == "1e-7"
    assert run_script("String(123456789012345678901)") == \
        "123456789012345680000"
    assert run_script("String(-0)") == "0"
    assert run_script("String(1e21)") == "1e+21"
    assert run_script("String(0.1)") == "0.1"


def test_delete_on_variable():
    assert run_script("var x=1; [delete x, x].join(',')") == "false,1"
    assert run_script("delete notDeclaredAnywhere") is True


def test_array_property_protocol():
    assert run_script("var a=[1,,3]; [a.hasOwnProperty(0), "
                      "a.hasOwnProperty(1), a.hasOwnProperty('2'), "
                      "a.hasOwnProperty('length')].join(',')") == \
        "true,false,true,true"
    assert run_script("var a=[1,2,3]; delete a[1]; "
                      "[a.length, 1 in a, String(a)].join('|')") == \
        "3|false|1,,3"
    assert run_script("var a=[]; a.foo=1; delete a.foo; 'foo' in a") \
        is False
    assert run_script("''+[1,,3]") == "1,,3"


# ---------------------------------------------------------------------------
# wave 8 (round 5): JS-regex-to-Python translation layer (node-verified;
# the one deliberate divergence is the ES6 sticky flag, which the ES5
# reference engine also rejects)
# ---------------------------------------------------------------------------


def test_regex_js_only_syntax():
    assert run_script("/[^]/.test('\\n')") is True
    assert run_script("/a[^]b/.test('a\\nb')") is True
    assert run_script("/\\cJ/.test('\\n')") is True
    assert run_script("/\\52/.test('*')") is True  # octal, no group 52
    assert run_script("/(ab)\\1/.test('abab')") is True  # real backref
    assert run_script("'89'.match(/\\8\\9/) !== null") is True


def test_regex_dot_excludes_line_separators():
    assert run_script("/a.b/.test('a\\u2028b')") is False
    assert run_script("/a.b/.test('a\\u2029b')") is False
    assert run_script("/a.b/.test('a b')") is True
    assert run_script("/a[.]b/.test('a.b')") is True  # class dot literal
