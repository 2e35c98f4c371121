"""IPADIC-convention lexicon subset (K1 data; VERDICT r2 missing #2).

The reference tokenizes with Kuromoji over IPADIC/NEologd (~400k entries,
not bundled here).  This module generates a few-thousand-entry subset from
public Japanese grammar: closed classes are enumerated (particles,
auxiliaries), open classes are curated base forms whose inflected surfaces
are EXPANDED programmatically by the standard conjugation paradigms —
exactly how IPADIC itself lists one row per surface form.

POS strings follow IPADIC's comma-joined convention (名詞,一般 /
動詞,自立 / 形容詞,自立 / 助詞,格助詞 / 助動詞 / 名詞,数 ...); the
reference's filter does substring containment on them
(ContentExtractor.java:115-128), so prefixes suffice.

Segmentation convention (IPADIC/Kuromoji): inflected verbs/adjectives are
stem+auxiliary sequences — 書かない = 書か (動詞,自立, base 書く) + ない
(助動詞); 高かった = 高かっ (形容詞,自立, base 高い) + た (助動詞).  The
generator therefore emits each STEM/音便 surface as its own entry carrying
the base form, and the auxiliaries close the sentence — the same rows an
IPADIC dump would contribute.
"""

from __future__ import annotations

Entry = tuple[str, str | None]  # (pos, base_form)

# ---------------------------------------------------------------------------
# closed classes
# ---------------------------------------------------------------------------

# 助詞 (particles) — dropped by the K2 filter; they matter for segmentation
# (a particle ends the preceding content word's run)
_PARTICLES: dict[str, str] = {
    "は": "助詞,係助詞", "も": "助詞,係助詞", "こそ": "助詞,係助詞",
    "さえ": "助詞,係助詞", "しか": "助詞,係助詞", "でも": "助詞,係助詞",
    "が": "助詞,格助詞", "を": "助詞,格助詞", "に": "助詞,格助詞",
    "で": "助詞,格助詞", "へ": "助詞,格助詞", "から": "助詞,格助詞",
    "より": "助詞,格助詞", "まで": "助詞,副助詞", "など": "助詞,副助詞",
    "だけ": "助詞,副助詞", "ほど": "助詞,副助詞", "くらい": "助詞,副助詞",
    "ぐらい": "助詞,副助詞", "ばかり": "助詞,副助詞", "ずつ": "助詞,副助詞",
    "と": "助詞,並立助詞", "や": "助詞,並立助詞", "か": "助詞,副助詞",
    "とか": "助詞,並立助詞", "なり": "助詞,並立助詞", "やら": "助詞,並立助詞",
    "の": "助詞,連体化", "ので": "助詞,接続助詞", "のに": "助詞,接続助詞",
    "けど": "助詞,接続助詞", "けれど": "助詞,接続助詞",
    "けれども": "助詞,接続助詞", "ながら": "助詞,接続助詞",
    "たり": "助詞,接続助詞", "ても": "助詞,接続助詞", "ば": "助詞,接続助詞",
    "て": "助詞,接続助詞",
    "ね": "助詞,終助詞", "よ": "助詞,終助詞", "な": "助詞,終助詞",
    "わ": "助詞,終助詞", "ぞ": "助詞,終助詞", "かしら": "助詞,終助詞",
    "について": "助詞,格助詞,連語", "における": "助詞,格助詞,連語",
    "に対して": "助詞,格助詞,連語", "として": "助詞,格助詞,連語",
    "によって": "助詞,格助詞,連語", "に関する": "助詞,格助詞,連語",
}

# 助動詞 (auxiliary verbs) — dropped by the filter
_AUXILIARIES: dict[str, str | None] = {
    # surface: base (None = surface is its own base)
    "です": None, "でし": "です", "ます": None, "まし": "ます",
    "ませ": "ます", "た": None, "だ": None, "だっ": "だ", "で": "だ",
    "ない": None, "なかっ": "ない", "なく": "ない", "ぬ": None, "ん": None,
    "たい": None, "たかっ": "たい", "たく": "たい",
    "れる": None, "れ": "れる", "られる": None, "られ": "られる",
    "せる": None, "せ": "せる", "させる": None, "させ": "させる",
    "う": None, "よう": None, "まい": None, "らしい": None, "らしく": "らしい",
    "そう": None, "べき": "べし", "である": None, "であっ": "である",
}

# ---------------------------------------------------------------------------
# open classes: curated base forms, surfaces generated below
# ---------------------------------------------------------------------------

# 五段 verbs by base form (last kana determines the conjugation row).
_GODAN = (
    "書く 行く 聞く 働く 歩く 着く 置く 開く 動く 続く 描く 引く 築く 招く "
    "泳ぐ 急ぐ 稼ぐ 防ぐ 繋ぐ "
    "話す 出す 返す 渡す 探す 示す 残す 移す 直す 表す 貸す 押す 消す 果たす "
    "待つ 立つ 持つ 勝つ 育つ 保つ 放つ "
    "死ぬ "
    "遊ぶ 呼ぶ 飛ぶ 学ぶ 選ぶ 運ぶ 結ぶ 並ぶ 喜ぶ "
    "読む 飲む 住む 進む 頼む 望む 楽しむ 含む 生む 組む 休む 積む 悩む "
    "乗る 取る 作る 送る 帰る 入る 売る 知る 走る 残る 戻る 守る 変わる "
    "分かる 始まる 終わる 集まる 決まる 止まる 当たる 折る 振る 渡る 図る "
    "語る 去る 成る 回る 上がる 下がる 広がる 繋がる 異なる 係る 関わる "
    "買う 使う 思う 言う 会う 合う 習う 歌う 笑う 払う 違う 向かう 扱う "
    "行う 伴う 従う 戦う 追う 救う 願う 狙う"
).split()

# 一段 verbs (stem = base minus る)
_ICHIDAN = (
    "食べる 見る 出る 寝る 起きる 開ける 閉める 始める 続ける 決める 考える "
    "教える 覚える 伝える 答える 調べる 比べる 集める 届ける 助ける 見せる "
    "見える 聞こえる 生きる 信じる 感じる 投げる 逃げる 捨てる 育てる 建てる "
    "立てる 変える 加える 超える 越える 迎える 植える 数える 抑える 支える "
    "進める 認める 求める 勧める 辞める 止める 眺める 納める 改める 任せる "
    "載せる 乗せる 合わせる 知らせる 忘れる 生まれる 倒れる 離れる 流れる "
    "現れる 優れる 遅れる 触れる 入れる 受ける 避ける 分ける 設ける 儲ける "
    "できる 用いる 率いる 降りる 借りる 足りる"
).split()

# 形容詞 base forms (〜い)
_ADJECTIVES = (
    "高い 安い 新しい 古い 大きい 小さい 良い 悪い 早い 速い 遅い 近い 遠い "
    "強い 弱い 長い 短い 広い 狭い 深い 浅い 重い 軽い 暑い 寒い 熱い 冷たい "
    "明るい 暗い 楽しい 嬉しい 悲しい 美しい 若い 多い 少ない 難しい 易しい "
    "優しい 厳しい 正しい 珍しい 詳しい 親しい 激しい 美味しい 面白い "
    "つまらない 危ない 忙しい 素晴らしい 白い 黒い 赤い 青い 甘い 辛い 苦い "
    "固い 硬い 柔らかい 細かい 細い 太い 丸い 鋭い 鈍い 賢い 偉い 凄い 酷い "
    "欲しい 無い 幅広い 数多い"
).split()

# 名詞,一般 — general nouns (news / web / tech / daily-life vocabulary)
_NOUNS_GENERAL = (
    "日本語 本文 記事 内容 情報 文化 技術 経済 社会 生活 音楽 歴史 科学 "
    "テキスト ホーム 規約 一覧 スマホ 会社 企業 政府 国家 地域 都市 東京 "
    "大阪 京都 世界 国際 国内 海外 市場 産業 金融 銀行 株式 資本 資金 価格 "
    "費用 収入 支出 利益 損失 税金 予算 貿易 輸出 輸入 製品 商品 品質 生産 "
    "製造 販売 購入 消費 顧客 価値 需要 供給 競争 戦略 経営 組織 部門 役員 "
    "社員 職員 従業 仕事 職業 労働 雇用 賃金 給与 会議 議論 決定 方針 政策 "
    "法律 制度 規則 権利 義務 責任 自由 平等 安全 危険 事故 事件 犯罪 警察 "
    "裁判 判決 選挙 投票 政治 政党 議員 大臣 首相 大統領 外交 条約 平和 "
    "戦争 軍事 防衛 環境 気候 天気 気温 自然 地球 宇宙 太陽 月間 星空 海洋 "
    "山脈 河川 森林 動物 植物 人間 人類 男性 女性 子供 大人 家族 両親 父親 "
    "母親 兄弟 姉妹 友人 友達 先生 学生 生徒 児童 学校 大学 高校 中学 小学 "
    "教育 学習 研究 調査 実験 理論 分析 結果 結論 原因 理由 目的 目標 計画 "
    "方法 手段 過程 手順 段階 状態 状況 場合 条件 問題 課題 解決 対策 対応 "
    "影響 効果 機能 性能 能力 才能 技能 知識 知恵 経験 記憶 思考 意見 意味 "
    "意識 感情 感覚 印象 想像 創造 芸術 文学 小説 詩歌 絵画 映画 演劇 写真 "
    "音声 映像 番組 放送 新聞 雑誌 出版 書籍 図書 辞書 言葉 言語 文字 文章 "
    "文法 表現 翻訳 通訳 会話 対話 発言 発表 報告 報道 記者 取材 広告 宣伝 "
    "通信 電話 郵便 手紙 連絡 交通 道路 鉄道 電車 列車 駅前 空港 飛行機 "
    "自動車 自転車 船舶 旅客 運転 速度 距離 時間 時刻 時代 時期 期間 季節 "
    "春夏 秋冬 今日 明日 昨日 今年 去年 来年 今月 先月 来月 今週 先週 来週 "
    "午前 午後 夜間 朝食 昼食 夕食 料理 食事 食品 食料 野菜 果物 肉類 魚類 "
    "飲料 酒類 病気 健康 医療 医者 病院 薬品 治療 手術 予防 検査 診断 症状 "
    "身体 頭部 心臓 血液 皮膚 筋肉 骨格 神経 脳波 精神 心理 睡眠 運動 "
    "スポーツ 野球 サッカー テニス 水泳 競技 選手 試合 勝利 敗北 優勝 "
    "記録 得点 観客 応援 趣味 娯楽 旅行 観光 宿泊 ホテル 旅館 温泉 祭り "
    "行事 伝統 習慣 宗教 神社 寺院 教会 信仰 祈り 建物 建築 住宅 家屋 部屋 "
    "玄関 台所 寝室 風呂 庭園 公園 広場 施設 設備 装置 機械 機器 道具 器具 "
    "材料 素材 金属 木材 石油 石炭 電力 電気 電子 原子 分子 物質 物体 重力 "
    "温度 湿度 圧力 変数 エネルギー 資源 燃料 発電 工場 工業 農業 漁業 "
    "林業 鉱業 農家 農村 都会 田舎 人口 住民 市民 国民 民族 移民 難民 福祉 "
    "年金 保険 介護 支援 援助 協力 参加 活動 運営 管理 指導 指示 命令 "
    "要求 要望 希望 期待 不安 心配 恐怖 喜び 悲しみ 怒り 驚き 笑顔 涙声 "
    "インターネット ネット ウェブ サイト ページ ブログ メール アドレス "
    "パソコン コンピュータ ソフト ソフトウェア ハードウェア アプリ データ "
    "ファイル フォルダ システム ネットワーク サーバ サーバー データベース "
    "プログラム コード 開発 設計 実装 試験 運用 保守 障害 復旧 更新 削除 "
    "登録 検索 表示 入力 出力 画面 画像 動画 配信 投稿 共有 接続 通知 設定 "
    "環境変数 パスワード アカウント ユーザ ユーザー 管理者 権限 認証 暗号 "
    "セキュリティ ウイルス 攻撃 対象 範囲 規模 水準 基準 標準 平均 合計 "
    "総額 金額 数量 割合 比率 統計 指標 傾向 変化 増加 減少 上昇 低下 成長 "
    "発展 進歩 改善 改革 革命 危機 災害 地震 台風 洪水 津波 火災 被害 復興 "
    "救援 避難 防災 気象 予報 観測 衛星 通貨 円高 円安 株価 相場 投資 投機 "
    "融資 借金 負債 資産 財産 不動産 土地 建設 開発者 記録的 歴史的 基本 "
    "基礎 応用 具体 抽象 全体 部分 中心 周辺 内部 外部 表面 裏側 前後 左右 "
    "上下 東西 南北 中央 地方 首都 県庁 市役所 役所 官庁 省庁 機関 委員 "
    "委員会 団体 協会 連盟 連合 組合 財団 法人 株式会社"
).split()

# 名詞,サ変接続 — suru-nouns (kept by the filter; +する segments as noun+verb)
_NOUNS_SAHEN = (
    "確認 利用 案内 登録 検索 表示 入力 出力 更新 削除 共有 接続 通知 設定 "
    "説明 紹介 報告 連絡 発表 発売 発行 発見 発明 開始 終了 完了 完成 作成 "
    "使用 採用 適用 活用 運用 導入 実施 実行 実現 執行 提供 提案 提出 提示 "
    "予約 予定 予測 予想 想定 検討 討論 議論 審議 承認 許可 禁止 制限 規制 "
    "緩和 強化 拡大 縮小 増加 減少 変更 変換 改善 改正 改定 修正 訂正 調整 "
    "調査 研究 開発 設計 実装 試験 検証 評価 判断 判定 決定 決断 選択 選定 "
    "指定 指摘 指導 教育 学習 練習 訓練 復習 予習 記録 記載 記入 記述 掲載 "
    "保存 保管 保護 保証 保障 管理 監視 監督 支援 援助 協力 参加 参照 出席 "
    "欠席 出発 到着 移動 移転 移行 輸送 配送 配達 配信 放送 中継 中止 中断 "
    "停止 停電 開催 開放 開設 閉鎖 公開 非公開 公表 募集 応募 採決 投票 "
    "当選 落選 就任 辞任 退任 入社 退社 入学 卒業 進学 留学 就職 転職 退職 "
    "結婚 離婚 出産 誕生 死亡 成功 失敗 勝利 敗退 優勝 準備 用意 整理 整備 "
    "清掃 掃除 洗濯 料理 買物 注文 注意 警告 警戒 攻撃 防御 防止 阻止 抵抗 "
    "反対 賛成 同意 合意 契約 締結 解約 解除 解決 解説 解釈 理解 誤解 把握 "
    "認識 意識 感謝 謝罪 依頼 要請 請求 支払 返済 返却 返信 送信 受信 受付 "
    "受領 獲得 取得 収集 集計 計算 計画 計測 測定 推定 推進 促進 推薦"
).split()

# 名詞,固有名詞 — proper nouns
_NOUNS_PROPER = (
    "日本 東京都 大阪府 京都府 北海道 沖縄 九州 四国 本州 富士山 アメリカ "
    "中国 韓国 インド イギリス フランス ドイツ イタリア ロシア カナダ "
    "ブラジル オーストラリア アジア ヨーロッパ アフリカ"
).split()

# 名詞,非自立 — dependent nouns (kept by the reference filter: POS contains
# 名詞 and not 数; single-char ones drop on the length gate anyway)
_NOUNS_HIJIRITSU = (
    "こと もの ため よう とき ところ はず わけ つもり まま ほう うち あいだ"
).split()

# 名詞,副詞可能 — adverbial nouns
_NOUNS_ADVERBIAL = (
    "今回 前回 次回 毎回 毎日 毎週 毎月 毎年 現在 過去 未来 将来 最近 最初 "
    "最後 最終 以前 以後 以降 以来 以上 以下 以内 以外 当時 当日 翌日 直後 "
    "直前 今後 本日 結局 全部 一部 大半 多数 少数 複数 単数"
).split()

# 名詞,数 — numerals (excluded by the reference's 数 test).  〇 (U+3007)
# is deliberately absent: it belongs to no TOKEN_RE script class, so the
# analyzer never probes at it — a 〇 row would be unreachable dead data
# that only pollutes the first-char probe tables.
_NUMERALS = list("一二三四五六七八九十百千万億兆") + (
    "一つ 二つ 三つ 四つ 五つ 六つ 七つ 八つ 九つ"
).split()

# 連体詞 / 副詞 / 接続詞 — dropped by the filter, needed for segmentation
_OTHERS: dict[str, str] = {
    "この": "連体詞", "その": "連体詞", "あの": "連体詞", "どの": "連体詞",
    "ある": "連体詞", "あらゆる": "連体詞", "いわゆる": "連体詞",
    "大きな": "連体詞", "小さな": "連体詞",
    "とても": "副詞,助詞類接続", "かなり": "副詞,助詞類接続",
    "すぐ": "副詞,助詞類接続", "もう": "副詞,助詞類接続",
    "まだ": "副詞,助詞類接続", "やはり": "副詞,助詞類接続",
    "すでに": "副詞,助詞類接続", "ほぼ": "副詞,助詞類接続",
    "および": "接続詞", "また": "接続詞", "さらに": "接続詞",
    "しかし": "接続詞", "だが": "接続詞", "そして": "接続詞",
    "ただし": "接続詞", "なお": "接続詞", "または": "接続詞",
}

_GODAN_ONBIN = {  # 音便 stem for た/て attachment, by base-form final kana
    "く": "い", "ぐ": "い", "す": "し", "つ": "っ", "ぬ": "ん",
    "ぶ": "ん", "む": "ん", "る": "っ", "う": "っ",
}
_GODAN_ROWS = {  # 未然/連用/終止/仮定/意向 stems by final kana
    "く": "かきくけこ", "ぐ": "がぎぐげご", "す": "さしすせそ",
    "つ": "たちつてと", "ぬ": "なにぬねの", "ぶ": "ばびぶべぼ",
    "む": "まみむめも", "る": "らりるれろ", "う": "わいうえお",
}


def _expand_godan(base: str) -> dict[str, Entry]:
    stem, last = base[:-1], base[-1]
    row = _GODAN_ROWS[last]
    out: dict[str, Entry] = {}
    for kana in row:  # 書か 書き 書く 書け 書こ
        out[stem + kana] = ("動詞,自立", base)
    out[stem + _GODAN_ONBIN[last]] = ("動詞,自立", base)  # 書い(た/て)
    return out


def _expand_ichidan(base: str) -> dict[str, Entry]:
    stem = base[:-1]
    out: dict[str, Entry] = {base: ("動詞,自立", base)}
    for suffix in ("", "れ", "ろ", "よ"):  # 食べ 食べれ 食べろ 食べよ
        out[stem + suffix] = ("動詞,自立", base)
    return out


def _expand_adjective(base: str) -> dict[str, Entry]:
    stem = base[:-1]  # drop the final い
    out: dict[str, Entry] = {}
    for suffix in ("い", "く", "かっ", "けれ"):  # 高い 高く 高かっ 高けれ
        out[stem + suffix] = ("形容詞,自立", base)
    return out


def _kept_by_filter(pos: str) -> bool:
    """The K2 filter outcome for a POS string (lexicon.py applies it to
    tokens; here it classifies ROWS for the collision audit below)."""
    return ("名詞" in pos and "数" not in pos) or "形容詞" in pos


# Cross-class collision policy: one surface, one row — when a hand-listed
# noun and a generated paradigm form (or closed-class row) share a surface,
# the merge below is last-writer-wins, which silently flipped two KEPT
# nouns to DROPPED rows in round 3 (喜び clobbered by _expand_godan('喜ぶ'),
# よう by the 助動詞 row).  The curated noun row wins at any kept/drop
# flip — Kuromoji would disambiguate by context, and on web text the
# deverbal-noun / 〜のような readings the curator listed are the ones the
# reference's filter keeps.  build_lexicon AUDITS this set exactly: a new
# flip (or a stale entry here) raises at import, never shadows silently.
_NOUN_WINS = frozenset({"喜び", "よう"})


def build_lexicon() -> dict[str, Entry]:
    """The full generated lexicon: surface → (pos, base_form)."""
    listed: dict[str, Entry] = {}
    for w in _NOUNS_GENERAL:
        listed[w] = ("名詞,一般", None)
    for w in _NOUNS_SAHEN:
        listed[w] = ("名詞,サ変接続", None)
    for w in _NOUNS_PROPER:
        listed[w] = ("名詞,固有名詞,地域", None)
    for w in _NOUNS_HIJIRITSU:
        listed[w] = ("名詞,非自立,一般", None)
    for w in _NOUNS_ADVERBIAL:
        listed[w] = ("名詞,副詞可能", None)
    for w in _NUMERALS:
        listed[w] = ("名詞,数", None)
    lex: dict[str, Entry] = dict(listed)
    for base in _GODAN:
        lex.update(_expand_godan(base))
    for base in _ICHIDAN:
        lex.update(_expand_ichidan(base))
    for base in _ADJECTIVES:
        lex.update(_expand_adjective(base))
    for s, pos in _OTHERS.items():
        lex[s] = (pos, None)
    for s, pos in _PARTICLES.items():
        lex[s] = (pos, None)
    for s, b in _AUXILIARIES.items():
        lex[s] = ("助動詞", b)
    # サ変 / カ変 irregulars (する / 来る)
    for s in ("し", "する", "すれ", "せよ", "しろ", "さ", "せ"):
        lex[s] = ("動詞,自立", "する")
    for s, b in (("来る", "来る"), ("来れ", "来る"), ("来い", "来る"),
                 ("き", "来る"), ("こ", "来る")):
        lex[s] = ("動詞,自立", b)
    # legacy mini-lexicon surfaces that the paradigms above don't generate
    lex.setdefault("します", ("動詞,自立", "する"))
    lex.setdefault("した", ("動詞,自立", "する"))
    lex.setdefault("トップページ", ("名詞,一般", None))
    lex.setdefault("プライバシー", ("名詞,一般", None))
    lex.setdefault("トピックス", ("名詞,一般", None))
    lex.setdefault("問い合わせ", ("名詞,サ変接続", None))
    lex.setdefault("問い合せ", ("名詞,サ変接続", None))
    # collision audit: every kept/drop flip against a curated noun row must
    # be acknowledged in _NOUN_WINS (where the noun row is restored), and
    # _NOUN_WINS must not carry stale surfaces — exact set equality
    flips = {
        s
        for s, e in listed.items()
        if _kept_by_filter(lex[s][0]) != _kept_by_filter(e[0])
    }
    if flips != set(_NOUN_WINS):
        raise AssertionError(
            "lexicon kept/drop collision audit failed; unacknowledged or "
            f"stale surfaces: {sorted(flips ^ set(_NOUN_WINS))}"
        )
    for s in flips:
        lex[s] = listed[s]
    return lex
