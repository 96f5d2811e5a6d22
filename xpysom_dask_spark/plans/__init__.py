"""Physical execution plans: the iterative training exchange
(broadcast codebook → per-partition Arrow partials → tree aggregation →
driver merge) and stateless Arrow scoring stages."""
