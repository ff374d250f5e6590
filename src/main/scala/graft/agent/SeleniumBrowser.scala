package graft.agent

/** Optional Selenium binding for the [[BrowserDriver]] seam (reference
  * module/web/actions/Foundation.scala:25-301 + WebDriverFactory): drives a
  * real headless Chrome when Selenium is on the executor classpath.
  *
  * Selenium is NOT a build dependency — everything here goes through
  * reflection and is guarded by [[SeleniumDriverFactory.isAvailable]], so
  * offline builds/tests never touch it (they use [[MockBrowser]]). Deploys
  * add the selenium jars to `spark.executor.extraClassPath`/`--jars` and pass
  * `ctx.withDrivers(SeleniumDriverFactory())`.
  *
  * Reference semantics kept: document-ready wait after navigation
  * (Foundation.scala `waitForDocumentReady`), frame switch by selector,
  * explicit waitFor polling, screenshots as PNG bytes.
  */
final case class SeleniumDriverFactory(
    headless: Boolean = true,
    extraArgs: Seq[String] = Nil
) extends DriverFactory {

  override def create(): BrowserDriver = {
    require(SeleniumDriverFactory.isAvailable,
      "Selenium is not on the classpath; add the selenium jars (e.g. via --jars) " +
        "or use MockBrowserFactory for offline runs")
    new SeleniumBrowser(headless, extraArgs)
  }
}

object SeleniumDriverFactory {

  /** True iff the Selenium API is loadable in this JVM. */
  def isAvailable: Boolean =
    try { Class.forName("org.openqa.selenium.WebDriver"); true }
    catch { case _: Throwable => false }
}

/** Reflection shim over org.openqa.selenium (never compile-time linked). */
private[agent] final class SeleniumBrowser(headless: Boolean, extraArgs: Seq[String])
    extends BrowserDriver {

  import SeleniumBrowser._

  private val driver: AnyRef = {
    val optionsCls = Class.forName("org.openqa.selenium.chrome.ChromeOptions")
    val options = optionsCls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    val args = (if (headless) Seq("--headless=new", "--no-sandbox", "--disable-gpu")
                else Seq.empty) ++ extraArgs
    if (args.nonEmpty)
      optionsCls.getMethod("addArguments", classOf[java.util.List[_]])
        .invoke(options, scala.jdk.CollectionConverters.SeqHasAsJava(args).asJava)
    Class.forName("org.openqa.selenium.chrome.ChromeDriver")
      .getConstructor(optionsCls)
      .newInstance(options)
      .asInstanceOf[AnyRef]
  }

  private def byCss(selector: String): AnyRef =
    Class.forName("org.openqa.selenium.By")
      .getMethod("cssSelector", classOf[String])
      .invoke(null, selector)

  private def findElement(selector: String): AnyRef =
    call(driver, "findElement", byClass -> byCss(selector))

  private def findElements(selector: String): Seq[AnyRef] = {
    import scala.jdk.CollectionConverters._
    call(driver, "findElements", byClass -> byCss(selector))
      .asInstanceOf[java.util.List[AnyRef]].asScala.toSeq
  }

  private def js(script: String, elemArgs: AnyRef*): AnyRef =
    call(driver, "executeScript",
      classOf[String] -> script,
      classOf[Array[AnyRef]] -> elemArgs.toArray)

  /** Reference Foundation.scala: block until document.readyState=complete. */
  private def waitDocumentReady(timeoutMillis: Long = 30000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    while (js("return document.readyState") != "complete" &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
  }

  override def visit(uri: String): Unit = {
    call(driver, "get", classOf[String] -> uri)
    waitDocumentReady()
  }

  override def click(selector: String): Unit = {
    call(findElement(selector), "click")
    waitDocumentReady()
  }

  override def clickNext(selector: String, exclude: Seq[String]): Unit = {
    val next = findElements(selector).find { e =>
      val href = call(e, "getAttribute", classOf[String] -> "href")
      href != null && !exclude.contains(href.toString)
    }.getOrElse(throw new IllegalArgumentException(s"clickNext: exhausted '$selector'"))
    call(next, "click")
    waitDocumentReady()
  }

  override def textInput(selector: String, text: String): Unit =
    call(findElement(selector), "sendKeys",
      classOf[Array[CharSequence]] -> Array[CharSequence](text))

  override def submit(selector: String): Unit = {
    call(findElement(selector), "submit")
    waitDocumentReady()
  }

  override def dropDownSelect(selector: String, value: String): Unit =
    js("arguments[0].value = arguments[1]; " +
      "arguments[0].dispatchEvent(new Event('change', {bubbles: true}));",
      findElement(selector), value)

  override def toFrame(selector: String): Unit = {
    val targetLocator = call(driver, "switchTo")
    call(targetLocator, "frame", webElementClass -> findElement(selector))
  }

  override def exeScript(script: String): Unit = { js(script); () }

  override def dragSlider(selector: String, percentage: Double): Unit =
    js("const el = arguments[0]; const p = arguments[1];" +
      "el.value = el.min ? (+el.min + (+el.max - +el.min) * p) : p;" +
      "el.dispatchEvent(new Event('input', {bubbles: true}));" +
      "el.dispatchEvent(new Event('change', {bubbles: true}));",
      findElement(selector), java.lang.Double.valueOf(percentage))

  override def waitFor(selector: String, timeoutMillis: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    while (findElements(selector).isEmpty) {
      if (System.currentTimeMillis() >= deadline)
        throw new IllegalStateException(s"waitFor: '$selector' never appeared at $currentUri")
      Thread.sleep(50)
    }
  }

  override def currentUri: String = call(driver, "getCurrentUrl").asInstanceOf[String]

  override def pageSource: String = call(driver, "getPageSource").asInstanceOf[String]

  override def screenshot: Array[Byte] = {
    val outputTypeCls = Class.forName("org.openqa.selenium.OutputType")
    val bytesType = outputTypeCls.getField("BYTES").get(null)
    call(driver, "getScreenshotAs", outputTypeCls -> bytesType).asInstanceOf[Array[Byte]]
  }

  override def close(): Unit = call(driver, "quit")

  private lazy val byClass = Class.forName("org.openqa.selenium.By")
  private lazy val webElementClass = Class.forName("org.openqa.selenium.WebElement")
}

private[agent] object SeleniumBrowser {

  /** Invoke a public method by name with explicitly-typed args (reflection —
    * argument classes must match the declared parameter types).
    */
  def call(target: AnyRef, name: String, args: (Class[_], AnyRef)*): AnyRef = {
    val paramTypes = args.map(_._1)
    val method = (target.getClass.getMethods.toSeq)
      .filter(_.getName == name)
      .find { m =>
        m.getParameterCount == paramTypes.size &&
          m.getParameterTypes.zip(paramTypes).forall { case (declared, given) =>
            declared.isAssignableFrom(given) || declared == given
          }
      }
      .getOrElse(throw new NoSuchMethodException(
        s"${target.getClass.getName}.$name(${paramTypes.map(_.getName).mkString(",")})"))
    method.setAccessible(true)
    method.invoke(target, args.map(_._2): _*)
  }
}
