"""demo_6.md §2.1 re-creation — the reference's flagship CDC flow:
three changelog streams (orders ⋈ products ⋈ shipments) materialized
into a wide `enriched_orders` row with update/delete propagation
(O14). The §2.1.3 verification sequence (insert order+shipment →
update shipment → update order → delete order) must leave the
materialized join equal to joining the final table states."""

from __future__ import annotations

import json

from flink_streaming_platform_web_spark.streaming.cdc import (
    decode_debezium,
    _scaffold_apply_changelog,
)
from flink_streaming_platform_web_spark.streaming.upsert import KeyedStore

PRODUCTS_DDL = "id INT, name STRING, description STRING"
ORDERS_DDL = (
    "order_id INT, order_date STRING, customer_name STRING, price DOUBLE,"
    " product_id INT, order_status BOOLEAN"
)
SHIPMENTS_DDL = (
    "shipment_id INT, order_id INT, origin STRING, destination STRING,"
    " is_arrived BOOLEAN"
)


def _env(op, before, after, ts):
    return json.dumps({"op": op, "before": before, "after": after, "ts_ms": ts})


PRODUCT_OPS = [
    _env("r", None, {"id": 101, "name": "scooter", "description": "3.5 wheel"}, 1),
    _env("r", None, {"id": 102, "name": "car battery", "description": "12V"}, 2),
]

ORDER_OPS = [
    _env("r", None, {"order_id": 10001, "order_date": "2020-07-30",
                     "customer_name": "Jark", "price": 50.5,
                     "product_id": 102, "order_status": False}, 3),
    # §2.1.3: insert a new order
    _env("c", None, {"order_id": 10004, "order_date": "2020-07-30",
                     "customer_name": "Jark", "price": 29.71,
                     "product_id": 101, "order_status": False}, 4),
    # update its status to true
    _env("u", {"order_id": 10004, "order_date": "2020-07-30",
               "customer_name": "Jark", "price": 29.71,
               "product_id": 101, "order_status": False},
         {"order_id": 10004, "order_date": "2020-07-30",
          "customer_name": "Jark", "price": 29.71,
          "product_id": 101, "order_status": True}, 6),
    # delete the first order
    _env("d", {"order_id": 10001, "order_date": "2020-07-30",
               "customer_name": "Jark", "price": 50.5,
               "product_id": 102, "order_status": False}, None, 7),
]

SHIPMENT_OPS = [
    _env("c", None, {"shipment_id": 1004, "order_id": 10004,
                     "origin": "Shanghai", "destination": "Beijing",
                     "is_arrived": False}, 5),
    _env("u", {"shipment_id": 1004, "order_id": 10004,
               "origin": "Shanghai", "destination": "Beijing",
               "is_arrived": False},
         {"shipment_id": 1004, "order_id": 10004, "origin": "Shanghai",
          "destination": "Beijing", "is_arrived": True}, 8),
]


def _apply(spark, ops, ddl, keys) -> KeyedStore:
    raw = spark.createDataFrame([(v,) for v in ops], "value STRING")
    store = KeyedStore(keys)
    _scaffold_apply_changelog(store)(decode_debezium(raw, ddl), 0)
    return store


def test_demo6_multiway_cdc_join(spark):
    products = _apply(spark, PRODUCT_OPS, PRODUCTS_DDL, ["id"])
    orders = _apply(spark, ORDER_OPS, ORDERS_DDL, ["order_id"])
    shipments = _apply(spark, SHIPMENT_OPS, SHIPMENTS_DDL, ["shipment_id"])

    # re-join the materialized states into enriched_orders (demo_6
    # §2.2.1 INSERT ... LEFT JOIN products LEFT JOIN shipments)
    o = orders.to_df(spark).createOrReplaceTempView("cdc_orders")
    products.to_df(spark).createOrReplaceTempView("cdc_products")
    shipments.to_df(spark).createOrReplaceTempView("cdc_shipments")
    enriched = {
        r["order_id"]: r.asDict()
        for r in spark.sql(
            """
            SELECT o.order_id, o.customer_name, o.price, o.order_status,
                   p.name AS product_name, s.destination, s.is_arrived
            FROM cdc_orders o
            LEFT JOIN cdc_products p ON o.product_id = p.id
            LEFT JOIN cdc_shipments s ON o.order_id = s.order_id
            """
        ).collect()
    }
    # order 10001 deleted → gone; 10004 updated to status=true, shipment
    # arrived, joined to product 101
    assert set(enriched) == {10004}
    row = enriched[10004]
    assert row["order_status"] is True
    assert row["product_name"] == "scooter"
    assert row["is_arrived"] is True
    assert row["destination"] == "Beijing"
