import sys
sys.path.insert(0, '/root/repo')
from pathlib import Path
import tempfile
tmp = Path(tempfile.mkdtemp(prefix='ds_drive_'))
from tests.shopify_fixtures import make_fixture_set
from shopify_etl_spark.session import get_spark
from shopify_etl_spark.sources.shopify_api import ShopifyDataSource
from pyspark.sql import functions as F

spark = get_spark('ds-drive', master='local[4]', shuffle_partitions=4)
spark.sparkContext.setLogLevel('ERROR')
spark.dataSource.register(ShopifyDataSource)
paths = make_fixture_set(tmp)

df = (spark.read.format('shopify')
      .option('entity','orders').option('path', str(paths['retail_orders']))
      .option('page_size','7').option('num_partitions','3').load())
print('R| full scan rows:', df.count(), 'partitions:', df.rdd.getNumPartitions())
filt = df.filter(F.col('updatedAt') > '2025-11-20')
print('R| filtered rows:', filt.count())
dc = (spark.read.format('shopify').option('entity','customers')
      .option('path', str(paths['retail_customers'])).load())
print('R| customers rows:', dc.count())
try:
    print(spark.read.format('shopify').option('entity','orders').load().count())
    print('R| missing-path: NO ERROR (bad)')
except Exception as e:
    print('R| missing-path error:', type(e).__name__, str(e).splitlines()[0][:90])
try:
    print(spark.read.format('shopify').option('entity','bogus').option('path','x').load().count())
    print('R| bogus-entity: NO ERROR (bad)')
except Exception as e:
    print('R| bogus-entity error:', type(e).__name__, str(e).splitlines()[0][:90])
spark.stop()
print('R| DONE')
