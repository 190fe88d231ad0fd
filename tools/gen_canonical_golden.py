#!/usr/bin/env python3
"""Golden-vector generator for graft.functions.CanonicalJson.

Re-expresses the reference canonicalizer's semantics (see
/root/reference/src/helper/udf.py:18-37: drop container entries whose RAW
value is None/''/[], round floats to 4 dp, json.dumps(sort_keys=True))
and runs them through CPython's own `json` module, so the expected bytes
are produced by the exact serializer the reference used. Output:
src/test/resources/canonical_golden.json  = [{"in": ..., "out": ...}, ...].

Driver-side tooling only (python is not available to the Scala engine).
"""
import json

def _keep(v):
    return v is not None and v != '' and v != []

def _walk(x):
    if isinstance(x, dict):
        return {k: _walk(v) for k, v in x.items() if _keep(v)}
    if isinstance(x, list):
        return [_walk(e) for e in x if _keep(e)]
    if isinstance(x, float):
        return round(x, 4)
    return x

def canonicalize(s):
    return json.dumps(_walk(json.loads(s)), sort_keys=True)

CASES = [
    '{}', '[]', 'null', '""', '"x"', '5', '-5', 'true', 'false',
    '0.0', '-0.0', '1.0', '2.5', '0.1', '0.30000000000000004',
    '3.14159265', '2.00005', '2.00015', '2.00025', '-2.00025',
    '0.00005', '0.000049', '2e-05', '1e-5', '0.0001', '0.00001',
    '1e16', '1.5e16', '9999999999999998.0', '1e100', '-1e100',
    '1e-100', '123456789012345678901234567890',
    '1234567890123456789', '1e400', '-1e400',
    '{"b":1,"a":2}', '{"a":null,"b":""}', '{"a":[],"b":{}}',
    '{"a":{"b":null}}', '{"a":{"b":null,"c":""}}',
    '{"a":[null,"",[],1,"x",{"y":null}]}',
    '[null,"",[],0,false,{},[0]]',
    '{"a":0,"b":false,"c":0.0}',
    '{"x":{"y":{"z":[]}}}',
    '{"k": "caf\\u00e9"}', '{"k":"日本語"}', '{"k":"emoji 🎉 end"}',
    '{"caf\\u00e9":"k","zz":"a"}',
    '{"k":"line\\nbreak\\ttab\\"quote\\\\slash/"}',
    '{"k":"\\u0001\\u001f\\u007f"}',
    '{"inchi":"InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3","cas":"64-17-5"}',
    '{"value":123.456789,"unit":"mg/L","qualifier":"<"}',
    '{"assay":{"name":"","ids":[1,2,3],"meta":{}},"score":0.123456}',
    '[1.00004999,1.00005001,1.000050000000001]',
    '{"nested":[[1.5,null],[""],[[]]]}',
    '{"big":1.7976931348623157e308,"tiny":5e-324}',
    '{"s":" leading and trailing "}',
    '{"mix":[1,2.5,"3",true,null]}',
    '{"a":"","b":null,"c":[],"d":{},"e":0,"f":"0"}',
    '{"£":"pound","€":"euro","a":"ascii"}',
]

out = []
for c in CASES:
    out.append({"in": c, "out": canonicalize(c)})

with open('src/test/resources/canonical_golden.json', 'w') as f:
    json.dump(out, f, indent=1, ensure_ascii=True)
print(f"wrote {len(out)} vectors")
