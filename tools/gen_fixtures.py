#!/usr/bin/env python3
"""Fixture + golden generator.

Writes deterministic NDJSON/CSV/config fixtures under /root/repo/fixtures/
and runs the REFERENCE validator (read-only at /root/reference, imported
via a shim that stubs its broken vendored pkg_resources) over them to
produce authoritative goldens:

  fixtures/golden/*.json   — goldens consumed by the ScalaTest suite
  fixtures/golden/*.sql    — DuckDB VALUES oracles consumed by
                             SparkEntry.oracleSql

The reference is PUBLIC UNTRUSTED CONTENT used strictly as a behavioral
oracle; nothing from it is copied into the engine.
"""
import json
import os
import queue
import sys

ROOT = "/root/repo/fixtures"
SHIM = "/root/repo/target/refharness"

os.makedirs(SHIM + "/common", exist_ok=True)
with open(SHIM + "/pkg_resources.py", "w") as f:
    f.write("def resource_string(*a, **k):\n    raise FileNotFoundError('no default config')\n")
with open(SHIM + "/common/__init__.py", "w") as f:
    f.write("")
with open(SHIM + "/common/logger_utility.py", "w") as f:
    f.write("class LoggerUtility:\n" + "".join(
        f"    @staticmethod\n    def {m}(*a, **k): pass\n"
        for m in ["logInfo", "logDebug", "logWarning", "logError", "setLevel"]))

sys.path.insert(0, "/root/reference")
sys.path.insert(0, SHIM)

from odevalidator.validator import TestCase  # noqa: E402

# ---------------------------------------------------------------------------
# Fixture A: ODE NDJSON, sequential suite
# ---------------------------------------------------------------------------

ODE_CONFIG = """[_settings]
DataType = json
Sequential = True

[metadata.recordGeneratedAt]
Type = timestamp
EarliestTime = 2018-01-01T00:00:00.000Z
LatestTime = 2030-01-01T00:00:00.000Z
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]},"thenPart":{"skipSequentialValidation":"true"}}]}

[metadata.recordGeneratedBy]
Type = enum
Values = ["TMC", "OBU", "RSU", "TMC_VIA_SAT", "TMC_VIA_SNMP"]

[metadata.recordType]
Type = enum
Values = ["bsmLogDuringEvent", "rxMsg", "dnMsg", "bsmTx", "driverAlert", "unsupported"]
EqualsValue = {"conditions":[
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["OBU", "RSU", "TMC_VIA_SAT", "TMC_VIA_SNMP"]},"thenPart":{"matchAgainst":${Values}}},
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]}}]}

[metadata.sanitized]
Type = enum
Values = ["True", "False"]

[metadata.schemaVersion]
Type = decimal
EqualsValue = 6

[metadata.payloadType]
Type = string
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordType","fieldValues":["bsmLogDuringEvent","bsmTx"]},"thenPart":{"matchAgainst":["us.dot.its.jpo.ode.model.OdeBsmPayload"]}},
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["dnMsg"]},"thenPart":{"matchAgainst":["us.dot.its.jpo.ode.model.OdeTimPayload"]}}]}

[metadata.logFileName]
Type = string
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["OBU", "RSU"]},"thenPart":{"startsWithField":"metadata.recordType"}},
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]}}]}

[metadata.odeReceivedAt]
Type = timestamp
EarliestTime = 2018-01-01T00:00:00.000Z

[metadata.serialId.streamId]
Type = string

[metadata.serialId.bundleSize]
Type = decimal
UpperLimit = 2147483648
LowerLimit = 1
EqualsValue = {"conditions":[
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["rxMsg"]},"thenPart":{"skipSequentialValidation":"true"}},
    {"ifPart":{"fieldName":"metadata.sanitized","fieldValues":["True"]},"thenPart":{"skipSequentialValidation":"true"}}]}

[metadata.serialId.bundleId]
Type = decimal
UpperLimit = 9223372036854775807
LowerLimit = 0

[metadata.serialId.recordId]
Type = decimal
UpperLimit = 2147483647
LowerLimit = 0
EqualsValue = {"conditions":[
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["rxMsg"]},"thenPart":{"skipSequentialValidation":"true"}},
    {"ifPart":{"fieldName":"metadata.sanitized","fieldValues":["True"]},"thenPart":{"skipSequentialValidation":"true"}}]}

[metadata.serialId.serialNumber]
Type = serial
UpperLimit = 9223372036854775807
LowerLimit = 0
EqualsValue = {"conditions":[
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["rxMsg"]},"thenPart":{"skipSequentialValidation":"true"}},
    {"ifPart":{"fieldName":"metadata.sanitized","fieldValues":["True"]},"thenPart":{"skipSequentialValidation":"true"}}]}

[metadata.receivedMessageDetails.locationData.latitude]
Type = decimal
LowerLimit = -90.0
UpperLimit = 90.0
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]}}]}

[metadata.receivedMessageDetails.locationData.elevation]
Type = decimal
LowerLimit = -409.6
UpperLimit = 6143.9
AllowEmpty = True

[metadata.receivedMessageDetails.rxSource]
Type = enum
Values = ["RSU", "SAT", "RV", "SNMP", "NA"]
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]}},
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["rxMsg"]},"thenPart":{"matchAgainst":${Values}}},
    {"ifPart":{"fieldName":"metadata.recordType","fieldValues":["bsmLogDuringEvent", "dnMsg", "bsmTx", "driverAlert"]}}]}

[metadata.request.ode.version]
Type = decimal
UpperLimit = 3
LowerLimit = 0
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["TMC"]},"thenPart":{"matchAgainst":[3]}},
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["OBU", "RSU", "TMC_VIA_SAT", "TMC_VIA_SNMP"]}}]}

[metadata.request.sdw.recordId]
Type = string
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.request.sdw.recordId"}},
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["OBU", "RSU", "TMC_VIA_SAT", "TMC_VIA_SNMP"]}}]}

[metadata.request.snmp.deliverystart]
Type = timestamp
DateFormat = %Y-%m-%d %H:%M:%S
EqualsValue = {"conditions":[{"ifPart":{"fieldName":"metadata.request.snmp.deliverystart"}},
    {"ifPart":{"fieldName":"metadata.recordGeneratedBy","fieldValues":["OBU", "RSU", "TMC_VIA_SAT", "TMC_VIA_SNMP"]}}]}

[metadata.request.rsus.rsus.list.rsuTarget]
Type = string

[metadata.request.rsus.rsus.list.rsuIndex]
Type = decimal
LowerLimit = 0
UpperLimit = 100
"""


def rec(serial, bundle_id, record_id, bundle_size, gen, recv,
        gen_by="OBU", rtype="bsmLogDuringEvent", sanitized="False",
        schema_version=6, payload_type="us.dot.its.jpo.ode.model.OdeBsmPayload",
        log_file=None, stream_id="s-1", lat="40.5", elev="",
        rx_source=None, ode_version="2", sdw_record_id=None,
        deliverystart=None, rsus="default", extra=None, drop=None):
    if log_file is None:
        log_file = rtype + "_file.log"
    m = {
        "recordGeneratedAt": gen,
        "recordGeneratedBy": gen_by,
        "recordType": rtype,
        "sanitized": sanitized,
        "schemaVersion": schema_version,
        "payloadType": payload_type,
        "logFileName": log_file,
        "odeReceivedAt": recv,
        "serialId": {
            "streamId": stream_id,
            "bundleSize": bundle_size,
            "bundleId": bundle_id,
            "recordId": record_id,
            "serialNumber": serial,
        },
        "receivedMessageDetails": {
            "locationData": {"latitude": lat, "elevation": elev},
        },
        "request": {"ode": {"version": ode_version}},
    }
    if rx_source is not None:
        m["receivedMessageDetails"]["rxSource"] = rx_source
    if sdw_record_id is not None:
        m.setdefault("request", {})["sdw"] = {"recordId": sdw_record_id}
    if deliverystart is not None:
        m.setdefault("request", {})["snmp"] = {"deliverystart": deliverystart}
    if rsus == "default":
        m["request"]["rsus"] = {"rsus": [
            {"rsuTarget": "10.0.0.1", "rsuIndex": 1},
            {"rsuTarget": "10.0.0.2", "rsuIndex": 2},
        ]}
    elif rsus == "missing":
        pass
    elif rsus == "empty":
        m["request"]["rsus"] = {"rsus": []}
    else:
        m["request"]["rsus"] = {"rsus": rsus}
    r = {"metadata": m, "payload": "p"}
    if extra:
        for k, v in extra.items():
            r["metadata"][k] = v
    if drop:
        for path in drop:
            parts = path.split(".")
            node = r["metadata"]
            for p in parts[:-1]:
                node = node[p]
            node.pop(parts[-1], None)
    return r


T = "2019-05-14T19:05:{:02d}.123Z"

FILE_A1 = [  # clean full bundle: 5 records, no failures
    rec(100 + i, 7, i, 5, T.format(10 + i), T.format(20 + i))
    for i in range(5)
]

FILE_A2 = [
    # bundle 1 (serials 200-202, size 3, full, clean increments)
    rec(200, 1, 0, 3, T.format(1), T.format(2)),
    rec(201, 1, 1, 3, T.format(2), T.format(3),
        # field violations on this one:
        gen_by="HOVERCRAFT",          # enum fail
        lat="95.5",                    # decimal above upper
        elev="not-a-number",           # decimal parse fail
        deliverystart="2019-05-14 19:05:47"),  # DateFormat ok
    rec(202, 1, 2, 3, T.format(1), T.format(4),  # generatedAt regresses (1 < 2)
        rtype="dnMsg",
        payload_type="us.dot.its.jpo.ode.model.OdeBsmPayload",  # matchAgainst fail (expects Tim)
        log_file="dnMsg_x.log",
        deliverystart="19:05:47 on May 14"),  # DateFormat parse fail
    # bundle 2: partial tail (recordIds 3,4 of size 5, last == size-1 ok)
    rec(203, 2, 3, 5, T.format(5), T.format(5)),
    rec(204, 2, 4, 5, T.format(6), T.format(6),
        rsus="missing"),               # missing list → two probes
    # serial gap 204→206; bundle 1 RECURS (island #3)
    rec(206, 1, 0, 2, T.format(7), T.format(7),
        rsus="empty",                  # empty list → zero probes
        drop=["recordGeneratedBy"]),   # presence fail + conditionals both-absent paths
    rec(207, 1, 1, 2, T.format(8), T.format(6)),  # odeReceivedAt regresses
    # bundle 4: size mismatch — full shape (first=0, last=size-1=1) but 2 != 3 declared.
    # NB an unparseable recordGeneratedAt would CRASH the reference's
    # Sequential (sequential.py:32 parses unguarded) — the dateutil
    # parse-failure path is exercised by the CSV fixture instead.
    rec(208, 4, 0, 3, T.format(9), T.format(9),
        rsus=[{"rsuTarget": "10.0.0.9", "rsuIndex": 200},   # rsuIndex above upper
              {"rsuIndex": 3},                               # rsuTarget missing
              {"rsuTarget": "10.0.0.11", "rsuIndex": -1}]),  # below lower
    rec(209, 4, 2, 3, T.format(10), T.format(11),  # recordId jump 0→2
        log_file="wrong_prefix.log"),  # startsWithField fail (OBU)
]

FILE_A3 = [  # skip-set gating: rxMsg/TMC/sanitized triggers suppress W2/W3/W5/W4-gen
    rec(300, 9, 0, 4, T.format(30), T.format(30), rtype="rxMsg", rx_source="RV",
        log_file="rxMsg_a.log"),
    rec(302, 9, 3, 4, T.format(29), T.format(31), rtype="rxMsg", rx_source="SAT",
        log_file="rxMsg_b.log", gen_by="TMC"),  # TMC: skips recordGeneratedAt checks
    rec(303, 9, 9, 4, T.format(28), T.format(29),  # receivedAt regress NOT suppressed
        rtype="rxMsg", rx_source="NA", log_file="rxMsg_c.log"),
]


# ---------------------------------------------------------------------------
# Fixture B: positional CSV
# ---------------------------------------------------------------------------

CSV_CONFIG = """[_settings]
DataType = csv
Sequential = False
HasHeader = True

[deviceid]
Type = decimal
UpperLimit = 10000
LowerLimit = 1

[utc]
Type = timestamp
EarliestTime = 2018-01-01T00:00:00.000Z

[local]
Type = timestamp
DateFormat = %Y-%m-%d %H:%M:%S

[note]
Type = string
AllowEmpty = True

[vsl_mph]
Type = decimal
UpperLimit = 100
LowerLimit = 0

[status]
Type = enum
Values = ["on", "off"]
"""

CSV_HEADER = "DeviceID,utc,local,note,vslmph,status"
CSV_ROWS = [
    "101,2019-05-14T19:05:47.123Z,2019-05-14 19:05:47,hello,55.5,on",
    "102,2019-05-14T19:05:48.123Z,2019-05-14 19:05:48,,0,ON",
    "103,2017-01-01T00:00:00Z,2019-05-14 19:05:49,note,150,off",
    "0,not-a-timestamp,19:05 on May 14,x,abc,standby",
    "104,2019-05-14T19:05:50.123Z,2019-05-14 19:05:50,ok,99.9,OFF",
    # comma-only line: NOT blank — the reference validates it per-field
    # ("Field empty" × 6, AllowEmpty note aside); only whitespace-only
    # lines are skipped (cvp_bucket_event_lambda_handler.py:45,52)
    ",,,,,",
    # extra trailing cell: the reference's parse_csv loops over field_list
    # only (validator.py:424-427) — surplus cells are silently ignored
    "106,2019-05-14T19:05:52.123Z,2019-05-14 19:05:52,tail,42,on,EXTRA",
]


# ---------------------------------------------------------------------------
# Fixture C: routing tree
# ---------------------------------------------------------------------------

ROUTE_SUITE_BSM = """[_settings]
DataType = json
Sequential = False

[metadata.recordType]
Type = enum
Values = ["bsmTx", "bsmLogDuringEvent"]

[metadata.serialId.serialNumber]
Type = decimal
LowerLimit = 0
"""

ROUTE_SUITE_TIM = """[_settings]
DataType = json
Sequential = False

[metadata.recordType]
Type = enum
Values = ["dnMsg", "driverAlert"]

[metadata.serialId.serialNumber]
Type = decimal
LowerLimit = 0
"""


ROUTE_SUITE_EDGE = """[_settings]
DataType = json
Sequential = False

[metadata.recordType]
Type = string
EqualsValue = "free-form"

[metadata.score]
Type = decimal

[metadata.serialId.serialNumber]
Type = decimal
LowerLimit = 0
"""


def route_rec(serial, rtype):
    return {"metadata": {"recordType": rtype,
                         "serialId": {"serialNumber": serial}}, "payload": "p"}


ROUTE_FILES = {
    "cv/provider1/bsm/2020/r1.json": [route_rec(1, "bsmTx"), route_rec(2, "rxMsg")],
    "cv/provider1/bsm/rootfile.json": [route_rec(3, "bsmTx")],  # at prefix root: skipped
    "cv/provider2/tim/2021/r2.json": [route_rec(4, "dnMsg"), route_rec(5, "bsmTx")],
    # rule-semantics edges, reference-pinned: a STRING EqualsValue still
    # runs the unconditional checks (Python Iterable branch) and a
    # limit-less decimal passes unparseable values (hasattr short-circuit)
    "cv/provider3/edge/2022/r3.json": [
        {"metadata": {"recordType": "anything-goes", "score": "abc",
                      "serialId": {"serialNumber": 10}}, "payload": "p"},
        {"metadata": {"score": "1.5",
                      "serialId": {"serialNumber": 11}}, "payload": "p"},
    ],
    "other/x/y/z.json": [route_rec(6, "dnMsg")],  # unmatched prefix: skipped
    # waze-style hive key exercising the P2 projections:
    "waze/type=alerts/table=t1/state=CO/w1.json": [route_rec(7, "dnMsg"),
                                                   route_rec(8, "dnMsg"),
                                                   route_rec(9, "dnMsg")],
}
ROUTE_PREFIXES = ["cv/provider1/bsm", "cv/provider2/tim", "cv/provider3/edge"]


# ---------------------------------------------------------------------------
# Write fixtures
# ---------------------------------------------------------------------------

def write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


FILE_A4 = [  # gzipped file (S4): clean 3-record bundle
    rec(400 + i, 11, i, 3, T.format(40 + i), T.format(50 + i))
    for i in range(3)
]

FILE_A5 = [  # null bundleIds: Python None == None -> ONE bundle
    # (sequential.py:96-104), so the serial gap 501->505 must fail INSIDE
    # it; a null-unsafe bundle comparison would split singletons and pass.
    # Field-validation side: bundleId null -> 'Field missing' per record.
    rec(500, None, 0, 3, T.format(52), T.format(53)),
    rec(501, None, 1, 3, T.format(53), T.format(54)),
    rec(505, None, 2, 3, T.format(54), T.format(55)),
]


# ---------------------------------------------------------------------------
# Fixture E: the reference's SHIPPED BSM/TIM rule corpus (config_2.ini),
# end-to-end. The config is read in place from /root/reference — the INI IS
# the reference's own query corpus. Records are authored to reach every
# rule's pass AND fail branches that stay deterministic under
# `LatestTime = NOW` (validator.py:69-70 captures the wall clock, so a
# future timestamp would embed it in the failure text; the grid therefore
# uses only past-aware / naive / unparseable values).
# ---------------------------------------------------------------------------

CONFIG2 = "/root/reference/odevalidator/config_2.ini"

BSM = "us.dot.its.jpo.ode.model.OdeBsmPayload"
TIM = "us.dot.its.jpo.ode.model.OdeTimPayload"
ALERT = "us.dot.its.jpo.ode.model.OdeDriverAlertPayload"


def rec2(serial, **kw):
    rtype = kw.get("rtype", "bsmLogDuringEvent")
    m = {
        "recordGeneratedAt": kw.get("gen", "2019-05-14T19:05:47.123Z"),
        "recordGeneratedBy": kw.get("gen_by", "OBU"),
        "recordType": rtype,
        "sanitized": kw.get("sanitized", "False"),
        "schemaVersion": kw.get("schema_version", 6),
        "securityResultCode": kw.get("src", "success"),
        "bsmSource": kw.get("bsm_source", "RV"),
        "payloadType": kw.get("payload_type", BSM),
        "logFileName": kw.get("log_file", rtype + "_file.log"),
        "odeReceivedAt": kw.get("recv", "2019-05-14T19:05:48.123Z"),
        "serialId": {"streamId": kw.get("stream_id", "s-1"),
                     "bundleSize": kw.get("bundle_size", 5),
                     "bundleId": kw.get("bundle_id", 1),
                     "recordId": kw.get("record_id", 0),
                     "serialNumber": serial},
        "receivedMessageDetails": {"locationData": {
            "latitude": kw.get("lat", "40.5"),
            "longitude": kw.get("lon", "-105.1"),
            "elevation": kw.get("elev", "1600.0"),
            "speed": kw.get("speed", "25.5"),
            "heading": kw.get("heading", "180.0")}},
        "request": {"ode": {"verb": kw.get("verb", "POST"),
                            # JSON int: the TMC condition is matchAgainst [3]
                            # — Python INT equality (validator.py:166)
                            "version": kw.get("version", 2)}},
    }
    if kw.get("rx_source") is not None:
        m["receivedMessageDetails"]["rxSource"] = kw["rx_source"]
    if kw.get("no_rmd"):
        del m["receivedMessageDetails"]
    if kw.get("sdw") is not None:
        m["request"]["sdw"] = kw["sdw"]
    if kw.get("snmp") is not None:
        m["request"]["snmp"] = kw["snmp"]
    if kw.get("rsus") is not None:
        m["request"]["rsus"] = {"rsus": kw["rsus"]}
    for path in kw.get("drop", []):
        node = m
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.get(p, {})
        node.pop(parts[-1], None)
    return {"metadata": m, "payload": "p"}


FILE_E1 = [
    # 1: clean OBU bsmLogDuringEvent baseline — every rule passes
    rec2(1),
    # 2: bsmTx may only carry bsmSource EV (matchAgainst, not the enum)
    rec2(2, rtype="bsmTx", bsm_source="RV"),
    # 3: 'unknown' IS in the bsmSource enum but NOT in the bsmLogDuringEvent
    # matchAgainst ['RV','EV']; schemaVersion 999 passes (EqualsValue=6 is a
    # non-Iterable -> reference skips ALL checks, validator.py:99)
    rec2(3, bsm_source="unknown", schema_version=999),
    # 4: rxSource RV forces payloadType OdeBsm (cond 4) — Tim fails
    rec2(4, rtype="rxMsg", rx_source="RV", payload_type=TIM),
    # 5: missing securityResultCode on rxMsg -> 'Required Field is missing.'
    rec2(5, rtype="rxMsg", rx_source="SAT", payload_type=TIM,
         drop=["securityResultCode"]),
    # 6: RSU bsmTx: startsWithField fail + unparseable recordGeneratedAt +
    # space/offset-separated aware odeReceivedAt (passes)
    rec2(6, gen_by="RSU", rtype="bsmTx", bsm_source="EV",
         log_file="wrongprefix.log", gen="not-a-date",
         recv="2019-05-14 19:05:47+00:00"),
    # 7: naive timestamps vs the aware NOW bound -> Python TypeError text
    rec2(7, gen="2019-05-14T19:05:47", recv="May 14 2019"),
    # 8: recordType 'unsupported' falls through securityResultCode conds ->
    # unconditional enum (case-INsensitive, unlike matchAgainst); bsmSource
    # cond 3 (payloadType==OdeBsm -> must be RV) fails on EV
    rec2(8, rtype="unsupported", src="SPDUCERTIFICATEEXPIRED", bsm_source="EV"),
    # 9: invalid recordGeneratedBy -> every generatedBy-conditioned rule
    # falls back to its unconditional check: logFileName free-form passes,
    # verb PATCH fails the enum, version 7 fails the 0..3 limits; dropped
    # schemaVersion still passes (opaque EqualsValue skips presence too)
    rec2(9, gen_by="HOVERCRAFT", log_file="zzz.log", verb="PATCH", version=7,
         drop=["schemaVersion"]),
    # 10: TMC dnMsg: matchAgainst is case-SENSITIVE ('SUCCESS' fails where
    # the enum would pass); TMC does NOT dodge recordGeneratedAt (naive ->
    # TypeError text); TMC skips the locationData + rxSource checks
    rec2(10, gen_by="TMC", rtype="dnMsg", src="SUCCESS", payload_type=TIM,
         gen="2019-05-14 12:00:00", lat="95.5", rx_source="SNMP",
         log_file="dn.log", verb="POST", version=3),
    # 11: TMC driverAlert: securityResultCode cond 2 passes garbage; verb GET
    # fails matchAgainst ['POST','PUT']; version 2 fails matchAgainst [3];
    # payloadType must be OdeDriverAlertPayload
    rec2(11, gen_by="TMC", rtype="driverAlert", src="garbage",
         payload_type=BSM, log_file="da.log", verb="GET", version=2),
    # 12: TMC hits the sdw/snmp unconditional fallbacks (the OBU-family
    # condition does not cover TMC): out-of-range corners, bad ttl, decimal
    # parse failures, limit-less snmp.status passes even unparseable
    rec2(12, gen_by="TMC", rtype="unsupported", no_rmd=True,
         drop=["securityResultCode"], log_file="u.log", verb="PUT", version=3,
         sdw={"recordId": "rec-1",
              "serviceRegion": {"nwCorner": {"latitude": "95.0",
                                             "longitude": "-200.5"},
                                "seCorner": {"latitude": "abc",
                                             "longitude": "150.0"}},
              "ttl": "fortnight"},
         snmp={"mode": "abc", "deliverystart": "2019-05-14T19:05:47Z",
               "deliverystop": "garbage", "rsuid": "-5", "enable": "2",
               "channel": "0", "msgid": "3.5", "interval": "-0.5",
               "status": "xyz"}),
    # 13: TMC_VIA_SAT: the OBU-family condition passes out-of-range corners,
    # a bogus ttl, unparseable snmp.mode and version 99 untouched — the
    # asymmetric twin of record 12; list-shaped rsus resolve to None under
    # config_2's non-.list paths (validator.py:172-194) and pass via the
    # self-referencing condition
    rec2(13, gen_by="TMC_VIA_SAT", rtype="dnMsg", src="unknown",
         payload_type=TIM, verb="DELETE", version=99,
         sdw={"recordId": "r-99",
              "serviceRegion": {"nwCorner": {"latitude": "95.0",
                                             "longitude": "10.0"},
                                "seCorner": {"latitude": "-95.0",
                                             "longitude": "10.0"}},
              "ttl": "badttl"},
         snmp={"mode": "abc"},
         rsus=[{"rsuTarget": "10.0.0.1", "rsuRetries": 2,
                "rsuTimeout": 3000, "rsuIndex": 1}]),
    # 14: whole serialId missing: the struct-typed [metadata.serialId] rule
    # AND all five leaf rules report 'Field missing'
    rec2(14, drop=["serialId"]),
    # 15: empty strings: streamId/latitude fail 'Field empty', elevation
    # passes (AllowEmpty), logFileName '' fails startsWithField
    rec2(15, stream_id="", lat="", elev="", log_file=""),
    # 16: enum case-insensitivity (sanitized TRUE) + the %d-truncated limit
    # texts: 359.99 > 359.9875 renders "'359' ... '359'"
    rec2(16, sanitized="TRUE", heading="359.99", speed="163.83",
         elev="6143.95"),
    # 17: serialId limit failures; serialNumber is Type=serial -> NO range
    # checks despite configured limits (validator.py:206-243 has no branch)
    rec2(-3, bundle_size=0, bundle_id=-1, record_id=2147483648),
]

FILE_E2 = [
    rec2(19, record_id=1),
    # rxSource NA -> payloadType must be Tim (cond 5)
    rec2(20, rtype="rxMsg", rx_source="NA", payload_type=TIM, src="unknown",
         record_id=2),
    # clean TMC: conditions pass everything
    rec2(21, gen_by="TMC", rtype="rxMsg", verb="PUT", version=3,
         log_file="tmc.log", record_id=3),
]


# ---------------------------------------------------------------------------
# Fixture F: JSON-parse-failure file-abort semantics. The reference's
# json.loads at validator.py:265 (inside validate_queue) is unguarded — ONE
# malformed line aborts the WHOLE file (the Lambda invocation throws and
# the file yields nothing). The golden records which files abort, via
# try/except around the live reference; the engine's strict mode drops
# every record of a corrupt-containing file to match.
# ---------------------------------------------------------------------------

FILE_F1 = [  # clean file: survives strict mode intact
    rec(600 + i, 20, i, 3, T.format(10 + i), T.format(11 + i))
    for i in range(3)
]
FILE_F2_LINES = [  # one malformed line among valid records -> file aborts
    json.dumps(rec(610, 21, 0, 2, T.format(20), T.format(21)),
               separators=(",", ":")),
    '{"metadata": {"serialId": {',  # truncated JSON — json.loads raises
    json.dumps(rec(611, 21, 1, 2, T.format(22), T.format(23)),
               separators=(",", ":")),
]


LENIENT_CONFIG = """[_settings]
DataType = json
Sequential = False

[ts]
Type = timestamp
EarliestTime = 2030-01-01T00:00:00.000Z
"""

# dateutil-leniency grid (validator.py:219 `dateutil.parser.parse`). The
# far-future EarliestTime makes every AWARE parseable value fail with
# "occurs before earliest limit '<str(parsed)>'" — pinning the PARSED
# VALUE, not just parseability. The r6 exclusions (non-UTC offsets,
# named UTC zones, invalid-date component errors) were REMOVED in r7 —
# all three families are pinned below; remaining residual is named
# non-UTC zones ("EST"), which dateutil resolves only through tzinfos.
LENIENT_TS_VALUES = [
    # aware (UTC): parsed value pinned via the earliest-limit message
    "2019-05-14T19:05:47Z",
    "2019-05-14T19:05:47+0000",
    "2019-05-14 19:05:47+00:00",
    "May 14 2019 19:05:47 +0000",
    "2019-05-14T19:05:47.123456Z",
    "20190514T190547Z",
    # naive: the reference's aware-bound compare raises TypeError
    "2019-05-14T19:05:47",
    "May 14 2019",
    "05/14/2019 19:05",
    "2019-05-14",
    "2019/05/14 19:05:47",
    # r7 widening — aware (UTC) exotics: RFC-2822, short/comma
    # fractions, leading whitespace
    "Tue, 14 May 2019 19:05:47 +0000",
    "2019-05-14T19:05:47.5Z",
    "2019-05-14T19:05:47,123456Z",
    " 2019-05-14T19:05:47Z",
    # r7 widening — naive exotics: ctime order, AM/PM, the implicit
    # dayfirst fallback (month 14 invalid -> dateutil retries
    # day-first), dotted dates, abbreviated-month-with-dashes,
    # compact yyyymmdd
    "Tue May 14 19:05:47 2019",
    "May 14, 2019 7:05:47 PM",
    "14/05/2019 19:05:47",
    "2019.05.14 19:05:47",
    "14-May-2019 19:05",
    "20190514",
    # r7 exclusion removals — named UTC zones (dateutil's UTCZONE
    # list), non-UTC offsets (str() preserves the ORIGINAL offset; the
    # engine re-shifts for display), and CPython's component-error
    # messages in constructor order (year, month, day, hour, minute,
    # second), leap days both ways
    "14 May 2019 19:05:47 GMT",
    "2019-05-14 19:05:47 UTC",
    "2019-05-14T19:05:47+05:30",
    "2019-05-14 19:05:47-07:00",
    "0000-01-01",
    "2019-13-05",
    "2019-02-31",
    "2019-02-29",
    "2020-02-29",
    "2019-05-14T25:05:47Z",
    "2019-05-14T19:65:47Z",
    "2019-05-14T19:05:99Z",
    # r7 review round: zone names on EVERY parseable shape (dateutil
    # strips GMT/UTC globally), double-timezone rejects, 1-digit /
    # minute-precision component errors, compact year 0, zone-id
    # rejects, single-digit ISO
    "2019-05-14T19:05:47 GMT",
    "14-May-2019 19:05 GMT",
    "05/14/2019 19:05:47 UTC",
    "20190514T190547Z GMT",
    "2019-05-14 19:05:47 +0000 GMT",
    "2019-05-14 25:05",
    "2019-13-5",
    "00000101",
    "2019-05-14 19:05:47 America/New_York",
    "2019-5-14",
    # r8 residual closure — RFC-1123 (weekday + named zone), POSIX
    # tzstr with the INVERTED sign (dateutil reads "UTC+05:30" as
    # Etc/GMT+5:30 = UTC-05:30), hour-only tzstr, zero tzstr, bare
    # unknown tznames (naive result, UnknownTimezoneWarning), and the
    # hour gate (tzname after a date-only value rejects)
    "Tue, 14 May 2019 19:05:47 GMT",
    "2019-05-14 19:05:47 UTC+05:30",
    "2019-05-14 19:05:47 GMT-7",
    "2019-05-14 19:05:47 UTC+0",
    "2019-05-14 19:05:47 EST",
    "2019-05-14 19:05:47 PQRST",
    # tzname ENDING in Z/UTC letters: must classify NAIVE (the aware
    # regex needs its word boundary — r8 review finding)
    "2019-05-14 19:05:47 NZ",
    "2019-05-14 19:05:47 XUTC",
    "2019-05-14 EST",
    # unparseable: dateutil ParserError "Unknown string format"
    "not-a-timestamp",
    "xx 99 zz",
]


def main():
    import gzip
    write(f"{ROOT}/odejson/suite.ini", ODE_CONFIG)
    for name, records in [("a1", FILE_A1), ("a2", FILE_A2), ("a3", FILE_A3),
                          ("a5", FILE_A5)]:
        lines = [json.dumps(r, separators=(",", ":")) for r in records]
        if name == "a2":  # blank + whitespace-only lines are skipped
            # (cvp_bucket_event_lambda_handler.py:45,52 — F13)
            lines = lines[:3] + ["", "   "] + lines[3:]
        write(f"{ROOT}/odejson/data/{name}.json", "\n".join(lines) + "\n")
    # gzip member must be byte-stable across regenerations: fix mtime=0
    a4_bytes = ("\n".join(json.dumps(r, separators=(",", ":"))
                          for r in FILE_A4) + "\n").encode()
    os.makedirs(f"{ROOT}/odejson/data", exist_ok=True)
    with open(f"{ROOT}/odejson/data/a4.json.gz", "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(a4_bytes)

    write(f"{ROOT}/csv/suite.ini", CSV_CONFIG)
    write(f"{ROOT}/csv/data/b1.csv", CSV_HEADER + "\n" + "\n".join(CSV_ROWS) + "\n")

    write(f"{ROOT}/route/cv/provider1/bsm/config.ini", ROUTE_SUITE_BSM)
    write(f"{ROOT}/route/cv/provider2/tim/config.ini", ROUTE_SUITE_TIM)
    write(f"{ROOT}/route/cv/provider3/edge/config.ini", ROUTE_SUITE_EDGE)
    # fixed, per-file mtimes so LastModified (P5) is oracle-checkable
    ROUTE_MTIME_BASE = 1705320000  # 2024-01-15T12:00:00Z
    for i, (key, records) in enumerate(sorted(ROUTE_FILES.items())):
        path = f"{ROOT}/route/{key}"
        write(path, "\n".join(json.dumps(r, separators=(",", ":"))
                               for r in records) + "\n")
        os.utime(path, (ROUTE_MTIME_BASE + i * 3600,) * 2)

    # -----------------------------------------------------------------------
    # Goldens from the reference validator
    # -----------------------------------------------------------------------
    goldens = {}

    def run_reference(config_path, lines, csv=False):
        tc = TestCase(config_path)
        q = queue.Queue()
        for ln in lines:
            q.put(ln)
        return tc, tc.validate_queue(q)

    # --- fixture A, per file
    field_rows = []       # (file, serial_number, field_path, valid, details)
    seq_rows = []         # (file, field_path, valid, details, serial_number)
    totals_rows = []      # (file, num_messages_total, num_validations, num_errors, num_error_messages, num_valid)
    hist_rows = []        # (file, error_message, occurrences)
    import gzip as _gzip
    for fname in ["a1.json", "a2.json", "a3.json", "a4.json.gz", "a5.json"]:
        path = f"{ROOT}/odejson/data/{fname}"
        raw = (_gzip.open(path, "rt").read() if fname.endswith(".gz")
               else open(path).read())
        lines = [ln for ln in raw.splitlines() if ln.strip()]
        tc, results = run_reference(f"{ROOT}/odejson/suite.ini", lines)
        parsed = [json.loads(ln) for ln in lines]
        # per-record field validations keyed by in-data serialNumber
        for rec_obj, res in zip(parsed, results):
            serial = rec_obj["metadata"]["serialId"]["serialNumber"]
            for v in res.field_validations:
                field_rows.append((fname, serial, v.field_path, v.valid, v.details))
        # sequential block = results beyond the record count
        for res in results[len(parsed):]:
            for v in res.field_validations:
                sid = v.serial_id["serialNumber"] if isinstance(v.serial_id, dict) else None
                seq_rows.append((fname, v.field_path, v.valid, v.details, sid))
        # totals + histogram: replicate the cvp loop (cvp...py:123-138) over
        # the FULL result list (sequential row included)
        num_msgs = num_vals = num_errs = num_err_msgs = 0
        error_dict = {}
        for res in results:
            num_msgs += 1
            num_vals += len(res.field_validations)
            is_valid = True
            for v in res.field_validations:
                if v.valid is False:
                    is_valid = False
                    num_errs += 1
                    msg = "Invalid field '" + str(v.field_path) + "' due to " + v.details
                    error_dict[msg] = error_dict.get(msg, 0) + 1
            if not is_valid:
                num_err_msgs += 1
        totals_rows.append((fname, num_msgs, num_vals, num_errs, num_err_msgs,
                            num_msgs - num_err_msgs))
        for msg, occ in error_dict.items():
            hist_rows.append((fname, msg, occ))

    goldens["ode_field_validations"] = field_rows
    goldens["ode_sequential"] = seq_rows
    goldens["ode_file_totals"] = totals_rows
    goldens["ode_error_histogram"] = hist_rows

    # --- fixture B (CSV): header consumed first, then rows
    csv_lines = [CSV_HEADER] + CSV_ROWS
    tc, results = run_reference(f"{ROOT}/csv/suite.ini", csv_lines, csv=True)
    csv_rows = []
    for raw, res in zip(CSV_ROWS, results):
        deviceid = raw.split(",")[0]
        for v in res.field_validations:
            csv_rows.append(("b1.csv", deviceid, v.field_path, v.valid, v.details))
    goldens["csv_field_validations"] = csv_rows

    # CSV per-file totals (non-sequential cvp loop)
    n_msgs = n_vals = n_errs = n_err_msgs = 0
    for res in results:
        n_msgs += 1
        n_vals += len(res.field_validations)
        bad = sum(1 for v in res.field_validations if v.valid is False)
        n_errs += bad
        n_err_msgs += 1 if bad else 0
    goldens["csv_file_totals"] = [("b1.csv", n_msgs, n_vals, n_errs,
                                   n_err_msgs, n_msgs - n_err_msgs)]

    # --- fixture C: routed pipeline per prefix
    route_rows = []  # (file, serial_number, field_path, valid, details)
    for prefix, cfg in [("cv/provider1/bsm", "cv/provider1/bsm/config.ini"),
                        ("cv/provider2/tim", "cv/provider2/tim/config.ini"),
                        ("cv/provider3/edge", "cv/provider3/edge/config.ini")]:
        for key, records in ROUTE_FILES.items():
            if not key.startswith(prefix):
                continue
            if key.count("/") <= prefix.count("/") + 1:
                continue  # root-file guard
            lines = [json.dumps(r, separators=(",", ":")) for r in records]
            tc, results = run_reference(f"{ROOT}/route/{cfg}", lines)
            for rec_obj, res in zip(records, results):
                serial = rec_obj["metadata"]["serialId"]["serialNumber"]
                for v in res.field_validations:
                    route_rows.append((key.split("/")[-1], serial,
                                       v.field_path, v.valid, v.details))
    goldens["route_field_validations"] = route_rows

    # --- fixture E: the shipped config_2.ini corpus, end-to-end
    for name, records in [("e1", FILE_E1), ("e2", FILE_E2)]:
        write(f"{ROOT}/config2/data/{name}.json",
              "\n".join(json.dumps(r, separators=(",", ":"))
                        for r in records) + "\n")
    c2_field_rows = []
    c2_totals_rows = []
    for fname, records in [("e1.json", FILE_E1), ("e2.json", FILE_E2)]:
        lines = [json.dumps(r, separators=(",", ":")) for r in records]
        tc, results = run_reference(CONFIG2, lines)
        for rec_obj, res in zip(records, results):
            serial = (rec_obj.get("metadata", {}).get("serialId") or
                      {}).get("serialNumber")
            for v in res.field_validations:
                c2_field_rows.append((fname, serial, v.field_path, v.valid,
                                      v.details))
        # non-sequential totals: the cvp loop (cvp...py:123-138)
        n_msgs = n_vals = n_errs = n_err_msgs = 0
        for res in results:
            n_msgs += 1
            n_vals += len(res.field_validations)
            bad = sum(1 for v in res.field_validations if v.valid is False)
            n_errs += bad
            n_err_msgs += 1 if bad else 0
        c2_totals_rows.append((fname, n_msgs, n_vals, n_errs, n_err_msgs,
                               n_msgs - n_err_msgs))
    goldens["config2_field_validations"] = c2_field_rows
    goldens["config2_file_totals"] = c2_totals_rows

    # --- fixture F: whole-file abort on a malformed JSON line
    f1_lines = [json.dumps(r, separators=(",", ":")) for r in FILE_F1]
    write(f"{ROOT}/abort/data/f1.json", "\n".join(f1_lines) + "\n")
    write(f"{ROOT}/abort/data/f2.json", "\n".join(FILE_F2_LINES) + "\n")
    abort_rows = []
    for fname, lines in [("f1.json", f1_lines), ("f2.json", FILE_F2_LINES)]:
        n_records = len([ln for ln in lines if ln.strip()])
        try:
            run_reference(f"{ROOT}/odejson/suite.ini", lines)
            abort_rows.append((fname, False, n_records))
        except Exception:
            # validate_queue raised -> the reference file yields NOTHING
            abort_rows.append((fname, True, n_records))
    assert [r[1] for r in abort_rows] == [False, True], abort_rows
    goldens["json_abort"] = abort_rows

    # --- fixture D: dateutil parse-leniency grid (validator.py:219)
    write(f"{ROOT}/lenient/suite.ini", LENIENT_CONFIG)
    lenient_records = [{"id": i, "ts": v} for i, v in enumerate(LENIENT_TS_VALUES)]
    write(f"{ROOT}/lenient/data/ts.json",
          "\n".join(json.dumps(r, separators=(",", ":")) for r in lenient_records) + "\n")
    tc, results = run_reference(
        f"{ROOT}/lenient/suite.ini",
        [json.dumps(r, separators=(",", ":")) for r in lenient_records])
    lenient_rows = []
    for rec_obj, res in zip(lenient_records, results):
        for v in res.field_validations:
            lenient_rows.append((rec_obj["id"], v.field_path, v.valid, v.details))
    goldens["rule_timestamp_lenient"] = lenient_rows

    os.makedirs(f"{ROOT}/golden", exist_ok=True)
    for name, rows in goldens.items():
        with open(f"{ROOT}/golden/{name}.json", "w") as f:
            json.dump(rows, f, indent=1, default=str)

    # -----------------------------------------------------------------------
    # DuckDB VALUES oracles
    # -----------------------------------------------------------------------
    def sql_lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    def values_sql(rows, cols, types):
        vals = ",\n".join("(" + ", ".join(sql_lit(v) for v in r) + ")" for r in rows)
        casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
        return f"SELECT {casts} FROM (VALUES\n{vals}\n) AS t({', '.join(cols)})"

    oracle = {
        "q_ode_field_validations": values_sql(
            field_rows, ["file", "serial_number", "field_path", "valid", "details"],
            ["VARCHAR", "BIGINT", "VARCHAR", "BOOLEAN", "VARCHAR"]),
        "q_ode_sequential": values_sql(
            seq_rows, ["file", "field_path", "valid", "details", "serial_number"],
            ["VARCHAR", "VARCHAR", "BOOLEAN", "VARCHAR", "BIGINT"]),
        "q_ode_file_totals": values_sql(
            totals_rows, ["file", "num_messages_total", "num_validations",
                          "num_errors", "num_error_messages", "num_valid"],
            ["VARCHAR"] + ["BIGINT"] * 5),
        "q_ode_error_histogram": values_sql(
            hist_rows, ["file", "error_message", "occurrences"],
            ["VARCHAR", "VARCHAR", "BIGINT"]),
        "q_csv_field_validations": values_sql(
            csv_rows, ["file", "deviceid", "field_path", "valid", "details"],
            ["VARCHAR", "VARCHAR", "VARCHAR", "BOOLEAN", "VARCHAR"]),
        "q_csv_file_totals": values_sql(
            goldens["csv_file_totals"],
            ["file", "num_messages_total", "num_validations", "num_errors",
             "num_error_messages", "num_valid"],
            ["VARCHAR"] + ["BIGINT"] * 5),
        "q_route_field_validations": values_sql(
            route_rows, ["file", "serial_number", "field_path", "valid", "details"],
            ["VARCHAR", "BIGINT", "VARCHAR", "BOOLEAN", "VARCHAR"]),
        "q_rule_timestamp_lenient": values_sql(
            lenient_rows, ["id", "field_path", "valid", "details"],
            ["BIGINT", "VARCHAR", "BOOLEAN", "VARCHAR"]),
        "q_ode_config2_full": values_sql(
            c2_field_rows,
            ["file", "serial_number", "field_path", "valid", "details"],
            ["VARCHAR", "BIGINT", "VARCHAR", "BOOLEAN", "VARCHAR"]),
        "q_ode_config2_totals": values_sql(
            c2_totals_rows,
            ["file", "num_messages_total", "num_validations", "num_errors",
             "num_error_messages", "num_valid"],
            ["VARCHAR"] + ["BIGINT"] * 5),
        # strict mode: only files the reference does NOT abort appear,
        # with their full record counts
        "q_json_abort_strict": values_sql(
            [(f, n) for (f, aborted, n) in abort_rows if not aborted],
            ["file", "n_records"], ["VARCHAR", "BIGINT"]),
    }
    # --- size-dependent oracles (file metadata, S2/S5) --------------------
    # metadata docs over the depth-5 route files (cv + waze)
    meta_rows = []
    from datetime import datetime, timezone
    for key, records in ROUTE_FILES.items():
        if key.count("/") != 4:
            continue
        path = f"{ROOT}/route/{key}"
        size = os.path.getsize(path)
        # P5: fixed-mtime fixtures make LastModified deterministic;
        # isoformat() renders UTC as +00:00 like the reference's
        # LastModified.isoformat() (never 'Z')
        lastmod = datetime.fromtimestamp(
            os.path.getmtime(path), tz=timezone.utc).replace(microsecond=0).isoformat()
        segs = key.split("/")
        def kv(tag):
            for s in segs:
                if s.startswith(tag + "="):
                    return s.split("=", 1)[1]
            return None
        # the reference gates by dataset (bucket_event_lambda_handler.py):
        # type=/table=/state= only for waze keys, positional
        # DataProvider/DataType only for cv keys
        is_waze = segs[0] == "waze"
        is_cv = segs[0] == "cv"
        meta_rows.append((key, size, lastmod, segs[0],
                          kv("type") if is_waze else None,
                          kv("table") if is_waze else None,
                          kv("state") if is_waze else None,
                          segs[1] if is_cv and len(segs) > 2 else None,
                          segs[2] if is_cv and len(segs) > 2 else None,
                          "test-env", len(records)))
    oracle["q_file_metadata"] = (
        "SELECT key, CAST(ContentLength AS BIGINT) AS ContentLength,\n"
        "  CAST(ContentLength AS DOUBLE)/1048576.0 AS SizeMiB,\n"
        "  LastModified,\n"
        "  md5(key) AS ETag, Dataset, TrafficType, TableName, State,\n"
        "  DataProvider, DataType, Environment,\n"
        "  CAST(MessageCount AS BIGINT) AS MessageCount\n"
        "FROM (VALUES\n" + ",\n".join(
            "(" + ", ".join(sql_lit(v) for v in r) + ")" for r in meta_rows) +
        "\n) AS t(key, ContentLength, LastModified, Dataset, TrafficType, TableName, State,"
        " DataProvider, DataType, Environment, MessageCount)")

    # S2/S5: per-file size + surviving line count of the odejson fixtures
    # (file_size is the on-disk — compressed for .gz — size, like S3
    # ContentLength for a gzipped object)
    s5_rows = []
    for fname in ["a1.json", "a2.json", "a3.json", "a4.json.gz", "a5.json"]:
        p = f"{ROOT}/odejson/data/{fname}"
        raw = (_gzip.open(p, "rt").read() if fname.endswith(".gz")
               else open(p).read())
        n = len([ln for ln in raw.splitlines() if ln.strip()])
        s5_rows.append((fname, os.path.getsize(p), n))
    oracle["q_file_lines"] = values_sql(
        s5_rows, ["file", "file_size", "n_lines"], ["VARCHAR", "BIGINT", "BIGINT"])

    # S4: content-sniffed gzip (magic bytes, NOT extension —
    # cvp_bucket_event_lambda_handler.py:28-30). Extension-less fixtures:
    # c1 plain, c2 gzip; c3.json.gz keeps one extension-ed control file.
    import gzip as _gz2
    os.makedirs(f"{ROOT}/sniff", exist_ok=True)
    sniff_payloads = {
        "c1": "\n".join(json.dumps(r, separators=(",", ":"))
                        for r in FILE_A1[:2]) + "\n\n  \n",
        "c2": "\n".join(json.dumps(r, separators=(",", ":"))
                        for r in FILE_A4) + "\n",
        "c3.json.gz": "\n".join(json.dumps(r, separators=(",", ":"))
                                for r in FILE_A3) + "\n",
    }
    for fname, payload in sniff_payloads.items():
        p = f"{ROOT}/sniff/{fname}"
        if fname == "c1":
            write(p, payload)
        else:  # gzip member byte-stable across regenerations: mtime=0
            with open(p, "wb") as f:
                with _gz2.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(payload.encode())
    sniff_rows = []
    for fname in sorted(sniff_payloads):
        p = f"{ROOT}/sniff/{fname}"
        blob = open(p, "rb").read()
        # the reference's decode: sniff magic bytes, then splitlines
        text = (_gz2.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob).decode()
        n = len([ln for ln in text.splitlines() if ln.strip()])
        sniff_rows.append((fname, os.path.getsize(p), n))
    oracle["q_gzip_sniff"] = values_sql(
        sniff_rows, ["file", "file_size", "n_lines"], ["VARCHAR", "BIGINT", "BIGINT"])

    for name, sql in oracle.items():
        write(f"{ROOT}/golden/{name}.sql", sql)

    print("fixtures written:", ROOT)
    for name, rows in goldens.items():
        print(f"  {name}: {len(rows)} golden rows")


if __name__ == "__main__":
    main()
