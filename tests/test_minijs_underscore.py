"""Third-party-library acceptance: underscore.js 1.13.4 (the Debian
`libjs-underscore` copy — 2k lines of real-world ES5, UMD wrapper,
Function-constructor global detection, _.template compilation) loads
VERBATIM in minijs and a 40-call API battery returns node-identical
results (every expectation below node-verified). This is the
plugin-VM credibility test: if underscore runs, typical third-party
crawler plugins run."""
import os

import pytest

from thecrowler_ray.minijs import run_script

LIB = "/usr/share/javascript/underscore/underscore.js"

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="underscore.js not installed")


@pytest.fixture(scope="module")
def lib():
    src = open(LIB).read()
    ver = run_script(src + "\nresult = _.VERSION;", max_ops=50_000_000)
    if ver != "1.13.4":
        pytest.skip(f"underscore {ver} != pinned 1.13.4")
    return src


def _run(lib_src, expr):
    return run_script(lib_src + f"\nresult = ({expr});",
                      max_ops=50_000_000)


BATTERY = [
    ("typeof _", "function"),
    ("_.VERSION", "1.13.4"),
    ("_.map([1,2,3], function(x){return x*2;}).join(',')", "2,4,6"),
    ("_.filter([1,2,3,4], function(x){return x%2===0;}).join(',')", "2,4"),
    ("_.reduce([1,2,3], function(a,b){return a+b;}, 0)", 6),
    ("_.keys({b:1,a:2}).join(',')", "b,a"),
    ("_.values({a:1,b:2}).join(',')", "1,2"),
    ("_.uniq([1,2,2,3,1]).join(',')", "1,2,3"),
    ("_.sortBy([3,1,2]).join(',')", "1,2,3"),
    ("_.isEqual({a:[1,{b:2}]}, {a:[1,{b:2}]})", True),
    ("_.range(5).join(',')", "0,1,2,3,4"),
    ("_.groupBy([1.3,2.1,2.4], Math.floor)['2'].join(',')", "2.1,2.4"),
    ("_.template('hi <%= name %>')({name:'bob'})", "hi bob"),
    ("_.template('<% for(var i=0;i<2;i++){ %>x<% } %>')()", "xx"),
    ("_.escape('a<b&c')", "a&lt;b&amp;c"),
    ("_.unescape('a&lt;b')", "a<b"),
    ("_.first([9,8,7])", 9),
    ("_.last([9,8,7])", 7),
    ("_.indexOf([1,2,3], 2)", 1),
    ("_.lastIndexOf([1,2,1], 1)", 2),
    ("_.sortedIndex([10,20,30], 25)", 2),
    ("_.contains([1,2,3], 9)", False),
    ("_.pluck([{n:'a'},{n:'b'}], 'n').join(',')", "a,b"),
    ("_.max([4,9,2])", 9),
    ("_.min([4,9,2])", 2),
    ("_.zip(['a','b'],[1,2])[1].join(',')", "b,2"),
    ("JSON.stringify(_.pick({a:1,b:2,c:3}, 'a', 'c'))",
     '{"a":1,"c":3}'),
    ("JSON.stringify(_.omit({a:1,b:2,c:3}, 'b'))", '{"a":1,"c":3}'),
    ("_.flatten([1,[2,[3]]]).join(',')", "1,2,3"),
    ("_.without([1,2,3], 2).join(',')", "1,3"),
    ("_.difference([1,2,3],[2]).join(',')", "1,3"),
    ("_.intersection([1,2,3],[2,3,4]).join(',')", "2,3"),
    ("_.union([1,2],[2,3]).join(',')", "1,2,3"),
    ("_.object(['a','b'],[1,2]).b", 2),
    ("_.invert({a:'x'}).x", "a"),
    ("_.extend({a:1},{b:2}).b", 2),
    ("_.defaults({a:1},{a:9,b:2}).a", 1),
    ("_.countBy([1,2,3], function(x){return x%2===0?'e':'o';}).o", 2),
    ("_.partition([0,1,2,3], function(x){return x%2;})[0].join(',')",
     "1,3"),
    ("_.compose(function(x){return x+1;}, "
     "function(x){return x*2;})(5)", 11),
    ("_.once(function(){return 3;})()", 3),
    ("_.memoize(function(x){return x*2;})(4)", 8),
    ("_.findWhere([{a:1},{a:2}],{a:2}).a", 2),
    ("_.where([{a:1},{a:1,b:2}],{a:1}).length", 2),
    ("_.has({a:1}, 'a')", True),
    ("_.result({f:function(){return 'r';}}, 'f')", "r"),
    ("_.isFunction(_.map)", True),
    ("_.chain([1,2,3]).map(function(x){return x+1;})"
     ".filter(function(x){return x>2;}).value().join(',')", "3,4"),
    ("_.clone([1,2]).length", 2),
    ("_.size({a:1,b:2})", 2),
]


def test_underscore_loads(lib):
    assert _run(lib, "_.VERSION") == "1.13.4"


@pytest.mark.parametrize("expr,expected",
                         BATTERY, ids=[e[:40] for e, _ in BATTERY])
def test_underscore_api(lib, expr, expected):
    assert _run(lib, expr) == expected


def test_underscore_shuffle_sample_shapes(lib):
    # Math.random is a deterministic per-interpreter stream, so only
    # the shape is pinned (values are stable per seed, not per spec)
    assert _run(lib, "_.shuffle([1,2,3]).sort().join(',')") == "1,2,3"
    assert _run(lib, "[5].indexOf(_.sample([5]))") == 0
