-- demo_6.md §2.1.2: the reference's flagship CDC flow — three
-- mysql-cdc changelog tables joined into a continuously-maintained
-- wide row with update/delete propagation (O14).
-- Reference sources: mysql binlog via the embedded CDC client;
-- here: the same debezium-JSON envelopes from a changelog file
-- ('graft.changelog-path' — swap for the binlog host options in a
-- real deployment, the query text is unchanged). Reference sink:
-- elasticsearch-7; here: a PK upsert sink (same MERGE contract).
CREATE TABLE products (
  id INT,
  name STRING,
  description STRING,
  PRIMARY KEY (id) NOT ENFORCED
) WITH (
  'connector' = 'mysql-cdc',
  'graft.changelog-path' = '${data_dir}/cdc_products'
);

CREATE TABLE orders (
  order_id INT,
  order_date STRING,
  customer_name STRING,
  price DOUBLE,
  product_id INT,
  order_status BOOLEAN,
  PRIMARY KEY (order_id) NOT ENFORCED
) WITH (
  'connector' = 'mysql-cdc',
  'graft.changelog-path' = '${data_dir}/cdc_orders'
);

CREATE TABLE shipments (
  shipment_id INT,
  order_id INT,
  origin STRING,
  destination STRING,
  is_arrived BOOLEAN,
  PRIMARY KEY (shipment_id) NOT ENFORCED
) WITH (
  'connector' = 'mysql-cdc',
  'graft.changelog-path' = '${data_dir}/cdc_shipments'
);

CREATE TABLE enriched_orders (
  order_id INT,
  order_date STRING,
  customer_name STRING,
  price DOUBLE,
  product_id INT,
  order_status BOOLEAN,
  product_name STRING,
  product_description STRING,
  shipment_id INT,
  origin STRING,
  destination STRING,
  is_arrived BOOLEAN,
  PRIMARY KEY (order_id) NOT ENFORCED
) WITH (
  'connector' = 'jdbc'
);

INSERT INTO enriched_orders
SELECT o.*, p.name, p.description, s.shipment_id, s.origin,
       s.destination, s.is_arrived
FROM orders AS o
LEFT JOIN products AS p ON o.product_id = p.id
LEFT JOIN shipments AS s ON o.order_id = s.order_id;
