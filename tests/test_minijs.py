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
