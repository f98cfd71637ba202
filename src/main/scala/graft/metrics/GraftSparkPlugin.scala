package graft.metrics

import java.util.Collections

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{
  DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin
}

/** Bridge graft's metric registry into Spark's own metrics system via the
  * public plugin API: set `spark.plugins=graft.metrics.GraftSparkPlugin`
  * and every sink the cluster already configures through
  * `spark.metrics.conf` (console, JMX, Graphite, Prometheus servlet, CSV)
  * reports graft metrics under the
  * `<appId>.driver.plugin.graft.metrics.GraftSparkPlugin.<table>.<op>.<metric>`
  * namespace — zero graft-side reporter code.
  *
  * This replaces the reference's per-backend reporter integrations
  * (hudi-client-common/.../metrics/MetricsReporterFactory.java: console /
  * JMX / Graphite / Datadog / Prometheus implementations) with the
  * sink fan-out Spark itself maintains. All graft metrics are driver-side
  * publish/planning metadata, so there is no executor plugin.
  *
  * Sinks poll the registry object at report time, so metrics created
  * AFTER registration (tables opened mid-application) flow through the
  * live-forwarding bridge (GraftMetrics.bridgeTo) without re-registration.
  */
final class GraftSparkPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(
        sc: SparkContext, ctx: PluginContext): java.util.Map[String, String] =
      Collections.emptyMap()
    override def registerMetrics(appId: String, ctx: PluginContext): Unit =
      GraftMetrics.bridgeTo(ctx.metricRegistry())
  }
  override def executorPlugin(): ExecutorPlugin = null
}
