"""pytdx financial archive (gpcw*.zip) source — SURVEY S3.

Reference: tasks/pytdx/stock_fin.py:34-426 — download gpcwYYYYMMDD.zip
archives, parse the binary table inside with the pytdx crawler, rename
``colN`` → English metric names via the Chinese-caption dict, derive
``ts_code`` from the exchange prefix, and upsert on (ts_code, report_date).

The binary layout is the public pytdx one (pytdx
crawler/history_financial_crawler.py, MIT):

- file header ``<1hI1H3L``: (magic, report_date YYYYMMDD, stock_count,
  report_size_bytes, _, _); fields_per_record = report_size // 4;
- a directory of ``stock_count`` items ``<6s1c1L``: (6-byte ASCII code,
  market byte, absolute file offset of the record);
- each record: ``fields_per_record`` little-endian float32 metrics.

Here the download step is out-of-engine (no network); the parse runs
distributed through ``read_binary_archives`` (binaryFile scan →
mapInPandas), one task per archive. ``make_gpcw_zip`` writes the same
layout for fixtures, so tests exercise the real byte path.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
from datetime import date, datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_HEADER = "<1hI1H3L"
_ITEM = "<6s1c1L"

# The full 282-field gpcw record layout, '%03d chinese caption' -> public
# QUANTAXIS English metric name (the vocabulary the reference adopts from
# QUANTAXIS issue #163 / QAData/financial_mean.py, MIT; reference spec:
# tasks/pytdx/stock_fin.py:46-381). Declarative pipe table, parsed once at
# import: ``index|chinese caption|english name``. The 1-based index is the
# field position in the binary record; sections in record order: per-share
# indicators, balance sheet, income statement, cash-flow statement,
# supplementary/single-quarter blocks.
_FIELD_TABLE = """\
001|基本每股收益|EPS
002|扣除非经常性损益每股收益|deductEPS
003|每股未分配利润|undistributedProfitPerShare
004|每股净资产|netAssetsPerShare
005|每股资本公积金|capitalReservePerShare
006|净资产收益率|ROE
007|每股经营现金流量|operatingCashFlowPerShare
008|货币资金|moneyFunds
009|交易性金融资产|tradingFinancialAssets
010|应收票据|billsReceivables
011|应收账款|accountsReceivables
012|预付款项|prepayments
013|其他应收款|otherReceivables
014|应收关联公司款|interCompanyReceivables
015|应收利息|interestReceivables
016|应收股利|dividendsReceivables
017|存货|inventory
018|其中：消耗性生物资产|expendableBiologicalAssets
019|一年内到期的非流动资产|noncurrentAssetsDueWithinOneYear
020|其他流动资产|otherLiquidAssets
021|流动资产合计|totalLiquidAssets
022|可供出售金融资产|availableForSaleSecurities
023|持有至到期投资|heldToMaturityInvestments
024|长期应收款|longTermReceivables
025|长期股权投资|longTermEquityInvestment
026|投资性房地产|investmentRealEstate
027|固定资产|fixedAssets
028|在建工程|constructionInProgress
029|工程物资|engineerMaterial
030|固定资产清理|fixedAssetsCleanUp
031|生产性生物资产|productiveBiologicalAssets
032|油气资产|oilAndGasAssets
033|无形资产|intangibleAssets
034|开发支出|developmentExpenditure
035|商誉|goodwill
036|长期待摊费用|longTermDeferredExpenses
037|递延所得税资产|deferredIncomeTaxAssets
038|其他非流动资产|otherNonCurrentAssets
039|非流动资产合计|totalNonCurrentAssets
040|资产总计|totalAssets
041|短期借款|shortTermLoan
042|交易性金融负债|tradingFinancialLiabilities
043|应付票据|billsPayable
044|应付账款|accountsPayable
045|预收款项|advancedReceivable
046|应付职工薪酬|employeesPayable
047|应交税费|taxPayable
048|应付利息|interestPayable
049|应付股利|dividendPayable
050|其他应付款|otherPayable
051|应付关联公司款|interCompanyPayable
052|一年内到期的非流动负债|noncurrentLiabilitiesDueWithinOneYear
053|其他流动负债|otherCurrentLiabilities
054|流动负债合计|totalCurrentLiabilities
055|长期借款|longTermLoans
056|应付债券|bondsPayable
057|长期应付款|longTermPayable
058|专项应付款|specialPayable
059|预计负债|estimatedLiabilities
060|递延所得税负债|defferredIncomeTaxLiabilities
061|其他非流动负债|otherNonCurrentLiabilities
062|非流动负债合计|totalNonCurrentLiabilities
063|负债合计|totalLiabilities
064|实收资本（或股本）|totalShare
065|资本公积|capitalReserve
066|盈余公积|surplusReserve
067|减：库存股|treasuryStock
068|未分配利润|undistributedProfits
069|少数股东权益|minorityEquity
070|外币报表折算价差|foreignCurrencyReportTranslationSpread
071|非正常经营项目收益调整|abnormalBusinessProjectEarningsAdjustment
072|所有者权益（或股东权益）合计|totalOwnersEquity
073|负债和所有者（或股东权益）合计|totalLiabilitiesAndOwnersEquity
074|其中：营业收入|operatingRevenue
075|其中：营业成本|operatingCosts
076|营业税金及附加|taxAndSurcharges
077|销售费用|salesCosts
078|管理费用|managementCosts
079|堪探费用|explorationCosts
080|财务费用|financialCosts
081|资产减值损失|assestsDevaluation
082|加：公允价值变动净收益|profitAndLossFromFairValueChanges
083|投资收益|investmentIncome
084|其中：对联营企业和合营企业的投资收益|investmentIncomeFromAffiliatedBusinessAndCooperativeEnterprise
085|影响营业利润的其他科目|otherSubjectsAffectingOperatingProfit
086|三、营业利润|operatingProfit
087|加：补贴收入|subsidyIncome
088|营业外收入|nonOperatingIncome
089|减：营业外支出|nonOperatingExpenses
090|其中：非流动资产处置净损失|netLossFromDisposalOfNonCurrentAssets
091|加：影响利润总额的其他科目|otherSubjectsAffectTotalProfit
092|四、利润总额|totalProfit
093|减：所得税|incomeTax
094|加：影响净利润的其他科目|otherSubjectsAffectNetProfit
095|五、净利润|netProfit
096|归属于母公司所有者的净利润|netProfitsBelongToParentCompanyOwner
097|少数股东损益|minorityProfitAndLoss
098|销售商品、提供劳务收到的现金|cashFromGoodsSalesorOrRenderingOfServices
099|收到的税费返还|refundOfTaxAndFeeReceived
100|收到其他与经营活动有关的现金|otherCashRelatedBusinessActivitiesReceived
101|经营活动现金流入小计|cashInflowsFromOperatingActivities
102|购买商品、接受劳务支付的现金|buyingGoodsReceivingCashPaidForLabor
103|支付给职工以及为职工支付的现金|paymentToEmployeesAndCashPaidForEmployees
104|支付的各项税费|paymentsOfVariousTaxes
105|支付其他与经营活动有关的现金|paymentOfOtherCashRelatedToBusinessActivities
106|经营活动现金流出小计|cashOutflowsFromOperatingActivities
107|经营活动产生的现金流量净额|netCashFlowsFromOperatingActivities
108|收回投资收到的现金|cashReceivedFromInvestmentReceived
109|取得投资收益收到的现金|cashReceivedFromInvestmentIncome
110|处置固定资产、无形资产和其他长期资产收回的现金净额|disposalOfNetCashForRecoveryOfFixedAssets
111|处置子公司及其他营业单位收到的现金净额|disposalOfNetCashReceivedFromSubsidiariesAndOtherBusinessUnits
112|收到其他与投资活动有关的现金|otherCashReceivedRelatingToInvestingActivities
113|投资活动现金流入小计|cashinFlowsFromInvestmentActivities
114|购建固定资产、无形资产和其他长期资产支付的现金|cashForThePurchaseConstructionPaymentOfFixedAssets
115|投资支付的现金|cashInvestment
116|取得子公司及其他营业单位支付的现金净额|acquisitionOfNetCashPaidBySubsidiariesAndOtherBusinessUnits
117|支付其他与投资活动有关的现金|otherCashPaidRelatingToInvestingActivities
118|投资活动现金流出小计|cashOutflowsFromInvestmentActivities
119|投资活动产生的现金流量净额|netCashFlowsFromInvestingActivities
120|吸收投资收到的现金|cashReceivedFromInvestors
121|取得借款收到的现金|cashFromBorrowings
122|收到其他与筹资活动有关的现金|otherCashReceivedRelatingToFinancingActivities
123|筹资活动现金流入小计|cashInflowsFromFinancingActivities
124|偿还债务支付的现金|cashPaymentsOfAmountBorrowed
125|分配股利、利润或偿付利息支付的现金|cashPaymentsForDistrbutionOfDividendsOrProfits
126|支付其他与筹资活动有关的现金|otherCashPaymentRelatingToFinancingActivities
127|筹资活动现金流出小计|cashOutflowsFromFinancingActivities
128|筹资活动产生的现金流量净额|netCashFlowsFromFinancingActivities
129|四、汇率变动对现金的影响|effectOfForeignExchangRateChangesOnCash
130|四(2)、其他原因对现金的影响|effectOfOtherReasonOnCash
131|五、现金及现金等价物净增加额|netIncreaseInCashAndCashEquivalents
132|期初现金及现金等价物余额|initialCashAndCashEquivalentsBalance
133|期末现金及现金等价物余额|theFinalCashAndCashEquivalentsBalance
134|净利润|netProfitFromOperatingActivities
135|资产减值准备|provisionForAssetsLosses
136|固定资产折旧、油气资产折耗、生产性生物资产折旧|depreciationForFixedAssets
137|无形资产摊销|amortizationOfIntangibleAssets
138|长期待摊费用摊销|amortizationOfLong_termDeferredExpenses
139|处置固定资产、无形资产和其他长期资产的损失|lossOfDisposingFixedAssetsIntangibleAssetsAndOtherLongTermAssets
140|固定资产报废损失|scrapLossOfFixedAssets
141|公允价值变动损失|lossFromFairValueChange
142|财务费用|financialExpenses
143|投资损失|investmentLosses
144|递延所得税资产减少|decreaseOfDeferredTaxAssets
145|递延所得税负债增加|increaseOfDeferredTaxLiabilities
146|存货的减少|decreaseOfInventory
147|经营性应收项目的减少|decreaseOfOperationReceivables
148|经营性应付项目的增加|increaseOfOperationPayables
149|其他|others
150|经营活动产生的现金流量净额2|netCashFromOperatingActivities2
151|债务转为资本|debtConvertedToCSapital
152|一年内到期的可转换公司债券|convertibleBondMaturityWithinOneYear
153|融资租入固定资产|leaseholdImprovements
154|现金的期末余额|cashEndingBal
155|现金的期初余额|cashBeginingBal
156|现金等价物的期末余额|cashEquivalentsEndingBal
157|现金等价物的期初余额|cashEquivalentsBeginningBal
158|现金及现金等价物净增加额|netIncreaseOfCashAndCashEquivalents
159|流动比率|currentRatio
160|速动比率|acidTestRatio
161|现金比率(%)|cashRatio
162|利息保障倍数|interestCoverageRatio
163|非流动负债比率(%)|noncurrentLiabilitiesRatio
164|流动负债比率(%)|currentLiabilitiesRatio
165|现金到期债务比率(%)|cashDebtRatio
166|有形资产净值债务率(%)|debtToTangibleAssetsRatio
167|权益乘数(%)|equityMultiplier
168|股东的权益/负债合计(%)|equityDebtRatio
169|有形资产/负债合计(%)|tangibleAssetDebtRatio
170|经营活动产生的现金流量净额/负债合计(%)|netCashFlowsFromOperatingActivitiesDebtRatio
171|EBITDA/负债合计(%)|EBITDA_Liabilities
172|应收帐款周转率|turnoverRatioOfReceivable
173|存货周转率|turnoverRatioOfInventory
174|运营资金周转率|turnoverRatioOfOperatingAssets
175|总资产周转率|turnoverRatioOfTotalAssets
176|固定资产周转率|turnoverRatioOfFixedAssets
177|应收帐款周转天数|daysSalesOutstanding
178|存货周转天数|daysSalesOfInventory
179|流动资产周转率|turnoverRatioOfCurrentAssets
180|流动资产周转天数|daysSalesofCurrentAssets
181|总资产周转天数|daysSalesofTotalAssets
182|股东权益周转率|equityTurnover
183|营业收入增长率(%)|operatingIncomeGrowth
184|净利润增长率(%)|netProfitGrowthRate
185|净资产增长率(%)|netAssetsGrowthRate
186|固定资产增长率(%)|fixedAssetsGrowthRate
187|总资产增长率(%)|totalAssetsGrowthRate
188|投资收益增长率(%)|investmentIncomeGrowthRate
189|营业利润增长率(%)|operatingProfitGrowthRate
190|暂无|None1
191|暂无|None2
192|暂无|None3
193|成本费用利润率(%)|rateOfReturnOnCost
194|营业利润率|rateOfReturnOnOperatingProfit
195|营业税金率|rateOfReturnOnBusinessTax
196|营业成本率|rateOfReturnOnOperatingCost
197|净资产收益率|rateOfReturnOnCommonStockholdersEquity
198|投资收益率|rateOfReturnOnInvestmentIncome
199|销售净利率(%)|rateOfReturnOnNetSalesProfit
200|总资产报酬率|rateOfReturnOnTotalAssets
201|净利润率|netProfitMargin
202|销售毛利率(%)|rateOfReturnOnGrossProfitFromSales
203|三费比重|threeFeeProportion
204|管理费用率|ratioOfChargingExpense
205|财务费用率|ratioOfFinancialExpense
206|扣除非经常性损益后的净利润|netProfitAfterExtraordinaryGainsAndLosses
207|息税前利润(EBIT)|EBIT
208|息税折旧摊销前利润(EBITDA)|EBITDA
209|EBITDA/营业总收入(%)|EBITDA_GrossRevenueRate
210|资产负债率(%)|assetsLiabilitiesRatio
211|流动资产比率|currentAssetsRatio
212|货币资金比率|monetaryFundRatio
213|存货比率|inventoryRatio
214|固定资产比率|fixedAssetsRatio
215|负债结构比|liabilitiesStructureRatio
216|归属于母公司股东权益/全部投入资本(%)|shareholdersOwnershipOfAParentCompany_TotalCapital
217|股东的权益/带息债务(%)|shareholdersInterest_InterestRateDebtRatio
218|有形资产/净债务(%)|tangibleAssets_NetDebtRatio
219|每股经营性现金流(元)|operatingCashFlowPerShareY
220|营业收入现金含量(%)|cashOfOperatingIncome
221|经营活动产生的现金流量净额/经营活动净收益(%)|netOperatingCashFlow_netOperationProfit
222|销售商品提供劳务收到的现金/营业收入(%)|cashFromGoodsSales_OperatingRevenue
223|经营活动产生的现金流量净额/营业收入|netOperatingCashFlow_OperatingRevenue
224|资本支出/折旧和摊销|capitalExpenditure_DepreciationAndAmortization
225|每股现金流量净额(元)|netCashFlowPerShare
226|经营净现金比率（短期债务）|operatingCashFlow_ShortTermDebtRatio
227|经营净现金比率（全部债务）|operatingCashFlow_LongTermDebtRatio
228|经营活动现金净流量与净利润比率|cashFlowRateAndNetProfitRatioOfOperatingActivities
229|全部资产现金回收率|cashRecoveryForAllAssets
230|营业收入|operatingRevenueSingle
231|营业利润|operatingProfitSingle
232|归属于母公司所有者的净利润|netProfitBelongingToTheOwnerOfTheParentCompanySingle
233|扣除非经常性损益后的净利润|netProfitAfterExtraordinaryGainsAndLossesSingle
234|经营活动产生的现金流量净额|netCashFlowsFromOperatingActivitiesSingle
235|投资活动产生的现金流量净额|netCashFlowsFromInvestingActivitiesSingle
236|筹资活动产生的现金流量净额|netCashFlowsFromFinancingActivitiesSingle
237|现金及现金等价物净增加额|netIncreaseInCashAndCashEquivalentsSingle
238|总股本|totalCapital
239|已上市流通A股|listedAShares
240|已上市流通B股|listedBShares
241|已上市流通H股|listedHShares
242|股东人数(户)|numberOfShareholders
243|第一大股东的持股数量|theNumberOfFirstMajorityShareholder
244|十大流通股东持股数量合计(股)|totalNumberOfTopTenCirculationShareholders
245|十大股东持股数量合计(股)|totalNumberOfTopTenMajorShareholders
246|机构总量（家）|institutionNumber
247|机构持股总量(股)|institutionShareholding
248|QFII机构数|QFIIInstitutionNumber
249|QFII持股量|QFIIShareholding
250|券商机构数|brokerNumber
251|券商持股量|brokerShareholding
252|保险机构数|securityNumber
253|保险持股量|securityShareholding
254|基金机构数|fundsNumber
255|基金持股量|fundsShareholding
256|社保机构数|socialSecurityNumber
257|社保持股量|socialSecurityShareholding
258|私募机构数|privateEquityNumber
259|私募持股量|privateEquityShareholding
260|财务公司机构数|financialCompanyNumber
261|财务公司持股量|financialCompanyShareholding
262|年金机构数|pensionInsuranceAgencyNumber
263|年金持股量|pensionInsuranceAgencyShareholfing
264|十大流通股东中持有A股合计(股)|totalNumberOfTopTenCirculationShareholdersForA
265|第一大流通股东持股量(股)|firstLargeCirculationShareholdersNumber
266|自由流通股(股)|freeCirculationStock
267|受限流通A股(股)|limitedCirculationAShares
268|一般风险准备(金融类)|generalRiskPreparation
269|其他综合收益(利润表)|otherComprehensiveIncome
270|综合收益总额(利润表)|totalComprehensiveIncome
271|归属于母公司股东权益(资产负债表)|shareholdersOwnershipOfAParentCompany
272|银行机构数(家)(机构持股)|bankInstutionNumber
273|银行持股量(股)(机构持股)|bankInstutionShareholding
274|一般法人机构数(家)(机构持股)|corporationNumber
275|一般法人持股量(股)(机构持股)|corporationShareholding
276|近一年净利润(元)|netProfitLastYear
277|信托机构数(家)(机构持股)|trustInstitutionNumber
278|信托持股量(股)(机构持股)|trustInstitutionShareholding
279|特殊法人机构数(家)(机构持股)|specialCorporationNumber
280|特殊法人持股量(股)(机构持股)|specialCorporationShareholding
281|加权净资产收益率(每股指标)|weightedROE
282|扣非每股收益(单季度财务指标)|nonEPSSingle
"""

FIELDS: list[tuple[int, str, str]] = [
    (int(i), zh, en)
    for i, zh, en in (ln.split("|") for ln in _FIELD_TABLE.strip().splitlines())
]

# reference-shaped dict ('%03d中文名' -> english), kept as the public API
FINANCIAL_DICT: dict[str, str] = {f"{i:03d}{zh}": en for i, zh, en in FIELDS}

_IDX = re.compile(r"\d{3}")


def col_rename_map(financial_dict: dict[str, str] | None = None) -> dict[str, str]:
    """'colN' → metric name, N from the 3-digit caption prefix (the
    reference's col_name_dic construction, stock_fin.py:372-378)."""
    d = financial_dict or FINANCIAL_DICT
    out = {}
    for key, val in d.items():
        m = _IDX.search(key)
        if m is not None:
            out[f"col{int(m.group())}"] = val
    return out


def _ts_code(code: str) -> str:
    """Exchange suffix rule (stock_fin.py:414): 6xxxxx → Shanghai, else
    Shenzhen."""
    return code + ".SH" if code.startswith("6") else code + ".SZ"


def parse_gpcw(path: str, content: bytes,
               financial_dict: dict[str, str] | None = None) -> pd.DataFrame:
    """Parse one gpcw zip payload → (ts_code, report_date, metrics...).

    Output columns: ts_code, report_date, then every metric named in
    ``financial_dict`` IN DICT ORDER — schema-on-read: an archive with fewer
    fields than the mapping (older files carry fewer blocks) yields nulls
    for the absent metrics, and unnamed trailing fields are dropped, so
    every archive conforms to one stable wide schema.
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        inner = [n for n in zf.namelist() if not n.endswith("/")]
        raw = zf.read(inner[0])
    hsize = struct.calcsize(_HEADER)
    isize = struct.calcsize(_ITEM)
    _, rdate, count, report_size, _, _ = struct.unpack(_HEADER, raw[:hsize])
    fields = report_size // 4
    rec_fmt = f"<{fields}f"
    report_date = datetime.strptime(str(rdate), "%Y%m%d").date()
    rename = col_rename_map(financial_dict)
    rows = []
    for i in range(count):
        off = hsize + i * isize
        code_b, _market, foa = struct.unpack(_ITEM, raw[off:off + isize])
        code = code_b.decode("ascii").rstrip("\x00")
        values = struct.unpack(rec_fmt, raw[foa:foa + report_size])
        row: dict[str, object] = {"ts_code": _ts_code(code),
                                  "report_date": report_date}
        for n in range(1, fields + 1):
            name = rename.get(f"col{n}")
            if name:
                row[name] = float(values[n - 1])
        rows.append(row)
    cols = ["ts_code", "report_date"] + list(
        (financial_dict or FINANCIAL_DICT).values())
    return pd.DataFrame(rows).reindex(columns=cols)


def out_schema(financial_dict: dict[str, str] | None = None) -> str:
    d = financial_dict or FINANCIAL_DICT
    metrics = ", ".join(f"{v} double" for v in d.values())
    return f"ts_code string, report_date date, {metrics}"


def read_stock_fin(spark: SparkSession, path_glob: str,
                   financial_dict: dict[str, str] | None = None) -> DataFrame:
    """Distributed gpcw ingest: one parse task per archive; downstream is the
    standard upsert on (ts_code, report_date)."""
    from .files import read_binary_archives

    def parse(path: str, content: bytes) -> pd.DataFrame:
        return parse_gpcw(path, content, financial_dict)

    return read_binary_archives(spark, path_glob, parse,
                                out_schema(financial_dict))


def make_gpcw_zip(path: str, report_date: date,
                  records: dict[str, list[float]]) -> None:
    """Write a gpcw archive in the real binary layout (fixture tool).

    ``records``: stock code → field values (all stocks must have the same
    field count).
    """
    fields = len(next(iter(records.values())))
    report_size = fields * 4
    hsize = struct.calcsize(_HEADER)
    isize = struct.calcsize(_ITEM)
    data_start = hsize + len(records) * isize
    header = struct.pack(_HEADER, 1, int(report_date.strftime("%Y%m%d")),
                         len(records), report_size, 0, 0)
    items, payload = [], []
    for i, (code, values) in enumerate(sorted(records.items())):
        foa = data_start + i * report_size
        market = b"1" if code.startswith("6") else b"0"
        items.append(struct.pack(_ITEM, code.encode("ascii"), market, foa))
        payload.append(struct.pack(f"<{fields}f", *values))
    blob = header + b"".join(items) + b"".join(payload)
    inner = f"gpcw{report_date.strftime('%Y%m%d')}.dat"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(inner, blob)
