SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders) WHERE rn = 1 AND o_custkey < 20 ORDER BY o_custkey;
SELECT c_custkey, ntile(4) OVER (ORDER BY c_custkey) AS q FROM customer WHERE c_custkey < 12 ORDER BY c_custkey;
