SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k;
SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k;
SELECT COUNT(*) AS n FROM (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier);
