"""Randomized differential fuzzer for the minijs plugin VM: generate
small ES5 expressions from a grammar, evaluate each in node (one
batched process) AND in minijs, normalize (-0 / NaN / ±Infinity kept
distinct) and diff. Usage: python scripts/jsfuzz.py [seed]. Requires
node on PATH; exits 0 with a score line either way. Known benign
residue: Math.pow may differ in the last ulp (implementation-
approximated per ES5 15.8.2)."""
import json
import random
import subprocess
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from thecrowler_ray.minijs import run_script, MiniJsError, MiniJsBudgetError

rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 1)

ATOMS = ["0", "1", "2", "-1", "0.5", "1.5", "NaN", "Infinity", "''",
         "'a'", "'1'", "'0'", "' '", "true", "false", "null", "undefined",
         "[]", "[0]", "[1,2]", "({})", "({a:1})", "'b'", "-0", "2.5",
         "'10'", "'x'", "1e3", "0.1"]
BINOPS = ["+", "-", "*", "/", "%", "<", ">", "<=", ">=", "==", "!=",
          "===", "!==", "&&", "||", "&", "|", "^", "<<", ">>", ">>>"]
UNOPS = ["!", "-", "+", "~", "typeof ", "void "]
FNS = ["String", "Number", "Boolean", "isNaN", "isFinite", "parseInt",
       "parseFloat"]


METHODS0 = ["length"]
METHODS1 = ["charAt", "indexOf", "slice", "concat", "split",
            "lastIndexOf", "substring", "substr"]
MATH1 = ["Math.floor", "Math.ceil", "Math.round", "Math.abs",
         "Math.sqrt"]
MATH2 = ["Math.max", "Math.min", "Math.pow"]


def gen_expr(depth=0):
    r = rng.random()
    if depth > 3 or r < 0.30:
        return rng.choice(ATOMS)
    if r < 0.62:
        return f"({gen_expr(depth+1)} {rng.choice(BINOPS)} {gen_expr(depth+1)})"
    if r < 0.74:
        return f"({rng.choice(UNOPS)}({gen_expr(depth+1)}))"
    if r < 0.80:
        return f"{rng.choice(FNS)}({gen_expr(depth+1)})"
    if r < 0.86:
        return (f"(String({gen_expr(depth+1)})."
                f"{rng.choice(METHODS1)}({gen_expr(depth+1)}))")
    if r < 0.90:
        return f"(String({gen_expr(depth+1)}).{rng.choice(METHODS0)})"
    if r < 0.94:
        return f"{rng.choice(MATH1)}({gen_expr(depth+1)})"
    if r < 0.97:
        return f"{rng.choice(MATH2)}({gen_expr(depth+1)}, {gen_expr(depth+1)})"
    return (f"(({gen_expr(depth+1)}) ? ({gen_expr(depth+1)}) "
            f": ({gen_expr(depth+1)}))")


def run_node_batch(exprs):
    """One node process for the whole batch (each expr isolated)."""
    prog = ["var out=[];"]
    for e in exprs:
        prog.append(
            "try { var v = (%s); out.push(typeof v==='undefined'?'U':"
            "(typeof v==='number'? (v!==v?'NaN':(v===1/0?'Inf':(v===-1/0?"
            "'-Inf':(v===0&&1/v<0?'-0':String(v))))) : "
            "JSON.stringify(v))); } catch(err) { out.push('ERR'); }" % e)
    prog.append("console.log(JSON.stringify(out));")
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
        f.write("\n".join(prog))
        path = f.name
    p = subprocess.run(["node", path], capture_output=True, text=True,
                       timeout=60)
    os.unlink(path)
    if p.returncode != 0:
        raise RuntimeError(p.stderr[:400])
    return json.loads(p.stdout.strip())


def mini_one(e):
    src = ("var v = (%s); result = (typeof v==='undefined')?'U':"
           "(typeof v==='number'? (v!==v?'NaN':(v===1/0?'Inf':(v===-1/0?"
           "'-Inf':(v===0&&1/v<0?'-0':String(v))))) : JSON.stringify(v));"
           % e)
    try:
        return run_script(src, max_ops=500_000)
    except (MiniJsError, MiniJsBudgetError):
        return "ERR"
    except Exception as ex:
        return f"CRASH {type(ex).__name__}: {ex}"


N = 4000
exprs = [gen_expr() for _ in range(N)]
node_out = run_node_batch(exprs)
bad = 0
seen_kinds = set()
for e, nv in zip(exprs, node_out):
    mv = mini_one(e)
    if str(mv) != str(nv):
        key = (str(nv)[:16], str(mv)[:16])
        bad += 1
        if key in seen_kinds:
            continue
        seen_kinds.add(key)
        print(f"EXPR: {e}\n  node: {nv!r}\n  mini: {mv!r}")
print(f"\n{bad}/{N} mismatches ({len(seen_kinds)} distinct kinds)")
