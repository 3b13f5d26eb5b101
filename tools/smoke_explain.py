"""Manual smoke: tiny ER fixture -> CertaExplainer.explain end-to-end."""
import sys

sys.path.insert(0, "/root/repo")

from certa_spark import CertaExplainer, NativeCosineMatcher, get_spark

spark = get_spark(master="local[4]", shuffle_partitions=4)

# tiny abt_buy-style fixture (FIXTURES.md §1.1)
rows_a = [
    (0, "apple iphone 12 pro", "smartphone with oled display", "999"),
    (1, "samsung galaxy s21", "android phone amoled", "799"),
    (2, "dell xps 13 laptop", "ultrabook intel i7", "1199"),
    (3, "sony wh 1000xm4 headphones", "noise cancelling wireless", "349"),
    (4, "logitech mx master 3 mouse", "wireless ergonomic", "99"),
]
rows_b = [
    (0, "apple iphone 12 pro max", "oled smartphone", "1099"),
    (1, "galaxy s21 samsung phone", "amoled android", "789"),
    (2, "hp spectre x360", "convertible laptop intel", "1299"),
    (3, "sony 1000xm4 wireless headphones", "noise cancelling", "339"),
    (4, "apple macbook air m1", "laptop with apple silicon", "999"),
]
cols = ["id", "name", "description", "price"]
A = spark.createDataFrame(rows_a, cols)
B = spark.createDataFrame(rows_b, cols)

ex = CertaExplainer(spark, A, B, data_augmentation="no")
l = dict(zip(cols, rows_a[0]))
r = dict(zip(cols, rows_b[0]))
# num_triangles=2 -> scan batch 4 <= 5-row sources, so support is found
res = ex.explain(l, r, NativeCosineMatcher(), num_triangles=2)
print("saliency:\n", res.saliency)
print("pss:\n", res.pss)
print("cf_summary:\n", res.cf_summary)
print("n_triangles:", len(res.triangles))
print("cfs:\n", res.counterfactuals.head(10))
spark.stop()
