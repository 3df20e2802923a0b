"""IoT-sensor fixture suite — mirrors the reference's
tests/fixtures/iot-sensors.spec.js shapes (FIXTURES.md §4): time-series
grouping by date parts, deeply-nested coordinate access, boolean/status
filters, window deltas, and metamorphic invariants (filter-subset,
sum-decomposition).
"""

from __future__ import annotations

import datetime as dt

import pytest

from aggo_spark import aggregate


@pytest.fixture(scope="module")
def readings(spark):
    t0 = dt.datetime(2024, 6, 1, 0, 0)
    rows = []
    vals = {"temperature": [20.0, 22.0, 35.0, 21.0], "pressure": [1.0, 1.2, 0.8, 1.1]}
    for si, sensor in enumerate(["temperature", "pressure"]):
        for i, v in enumerate(vals[sensor]):
            rows.append({
                "_id": f"READ-{si}-{i}",
                "deviceId": f"dev-{i % 2}",
                "sensorType": sensor,
                "timestamp": t0 + dt.timedelta(hours=6 * i + si),
                "value": v,
                "status": "critical" if v > 30 else "normal",
                "location": {"building": "A" if i % 2 == 0 else "B", "floor": i % 3,
                             "coordinates": {"lat": 52.0 + i, "lng": 13.0 + i}},
                "metadata": {"batteryLevel": 90 - 10 * i, "signalStrength": -40 - i},
            })
    schema = (
        "`_id` string, deviceId string, sensorType string, timestamp timestamp, "
        "value double, status string, "
        "location struct<building string, floor long, coordinates struct<lat double, lng double>>, "
        "metadata struct<batteryLevel long, signalStrength long>"
    )
    return spark.createDataFrame(rows, schema)


def rows_of(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_group_by_sensor_and_day_hour(readings):
    out = rows_of(aggregate(readings, [
        {"$group": {"_id": {"sensor": "$sensorType", "h": {"$hour": "$timestamp"}},
                    "avg_v": {"$avg": "$value"}, "n": {"$sum": 1}}},
        {"$project": {"_id": 0, "sensor": "$_id.sensor", "h": "$_id.h",
                      "avg_v": 1, "n": 1}},
        {"$sort": {"sensor": 1, "h": 1}},
    ]))
    temps = [r for r in out if r["sensor"] == "temperature"]
    assert [r["h"] for r in temps] == [0, 6, 12, 18]
    assert temps[2]["avg_v"] == 35.0


def test_nested_coordinate_projection_and_filter(readings):
    out = rows_of(aggregate(readings, [
        {"$match": {"location.building": "A", "status": "normal"}},
        {"$project": {"_id": 1, "lat": "$location.coordinates.lat",
                      "floor": "$location.floor"}},
        {"$sort": {"_id": 1}},
    ]))
    assert all(r["lat"] in (52.0, 54.0) for r in out)
    assert len(out) == 3  # 4 building-A readings minus the critical one


def test_critical_alert_summary(readings):
    out = rows_of(aggregate(readings, [
        {"$match": {"status": "critical"}},
        {"$group": {"_id": "$deviceId", "worst": {"$max": "$value"},
                    "batteries": {"$push": "$metadata.batteryLevel"}}},
        {"$sort": {"_id": 1}},
    ]))
    assert out[0]["_id"] == "dev-0" and out[0]["worst"] == 35.0
    assert out[0]["batteries"] == [70]


def test_window_delta_per_sensor(readings):
    out = rows_of(aggregate(readings, [
        {"$setWindowFields": {
            "partitionBy": "$sensorType",
            "sortBy": {"timestamp": 1},
            "output": {"prev": {"$shift": {"output": "$value", "by": -1}}}}},
        {"$addFields": {"delta": {"$subtract": ["$value", {"$ifNull": ["$prev", "$value"]}]}}},
        {"$match": {"sensorType": "temperature"}},
        {"$sort": {"timestamp": 1}},
        {"$project": {"_id": 0, "delta": 1}},
    ]))
    assert [r["delta"] for r in out] == [0.0, 2.0, 13.0, -14.0]


def test_metamorphic_filter_subset_and_sum_decomposition(readings):
    """The reference's metamorphic invariants (ecommerce-orders.spec.js:15-50):
    a filtered aggregate is ≤ the unfiltered; per-group sums add to total."""
    total = rows_of(aggregate(readings, [
        {"$group": {"_id": None, "s": {"$sum": "$value"}}}]))[0]["s"]
    per_group = rows_of(aggregate(readings, [
        {"$group": {"_id": "$sensorType", "s": {"$sum": "$value"}}}]))
    assert sum(r["s"] for r in per_group) == pytest.approx(total)
    filtered = rows_of(aggregate(readings, [
        {"$match": {"status": "normal"}},
        {"$group": {"_id": None, "s": {"$sum": "$value"}}}]))[0]["s"]
    assert filtered <= total
