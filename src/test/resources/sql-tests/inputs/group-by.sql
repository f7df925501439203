SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS nd FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;
SELECT c_mktsegment, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment;
